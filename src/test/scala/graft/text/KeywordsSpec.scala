package graft.text

import graft.SparkSpec

class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  test("rare repeated terms outrank ubiquitous ones; ties break by term") {
    val docs = Seq(
      (1L, "the the the quark quark boson"),
      (2L, "the boson boson lepton"),
      (3L, "the muon")).toDF("doc_id", "text")
    val got = TextAnalysis.keywords(docs, nDocs = 3, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    // doc1: quark tf=2 df=1 → sal 6; the tf=3 df=3 → sal 3; boson tf=1 df=2 → sal 1
    // doc2: boson tf=2 df=2 → sal 3; lepton tf=1 df=1 → sal 3; the tf=1 df=3 → 1.
    //       boson vs lepton: equal salience, boson higher tf → boson first
    // doc3: muon tf=1 df=1 → sal 3; the tf=1 df=3 → sal 1
    assert(got == Seq(
      (1L, 1L, "quark"), (1L, 2L, "the"),
      (2L, 1L, "boson"), (2L, 2L, "lepton"),
      (3L, 1L, "muon"), (3L, 2L, "the")))
  }

  test("normalization strips punctuation/case before counting; null text yields no rows") {
    val docs = Seq((1L, "Alpha, ALPHA! beta."), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.keywords(docs, nDocs = 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3))).sorted.toSeq
    assert(got == Seq((1L, "alpha", 2L), (1L, "beta", 1L)))
  }
}
