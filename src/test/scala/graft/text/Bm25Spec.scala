package graft.text

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // N = 4 docs, S = 11 tokens; terms apple (df 2), banana (df 2) →
  // idf_micro = (1e6·(2·2+1)) div (2·2+1) = 1_000_000 for both, and
  // tfnorm_micro(tf, len) = (1e6·22·tf·11) div (110·tf + 33 + 36·len).
  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "banana banana banana banana"),
    (4L, "durian fig")).toDF("doc_id", "text")

  test("bm25 integer-micros scores match the hand computation exactly") {
    val out = TextAnalysis.bm25(docs, Seq("apple", "banana"), k = 20)
      .select("doc_id", "n_terms_hit", "bm25_e12")
      .as[(Long, Long, Long)].collect()
    // d1: apple tf=2,len=3 → 484e6 div 361 = 1_340_720;
    //     banana tf=1,len=3 → 242e6 div 251 = 964_143 → Σ·1e6
    // d3: banana tf=4,len=4 → 968e6 div 617 = 1_568_881
    // d2: apple tf=1,len=2 → 242e6 div 215 = 1_125_581
    assert(out.toSeq == Seq(
      (1L, 2L, 2304863000000L),
      (3L, 1L, 1568881000000L),
      (2L, 1L, 1125581000000L)))
  }

  test("bm25 honors k and the (score DESC, doc_id) tie-break order") {
    val tied = Seq((10L, "apple pie"), (7L, "apple pie")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(tied, Seq("apple"), k = 1)
      .select("doc_id").as[Long].collect()
    assert(out.toSeq == Seq(7L)) // identical scores → lowest doc_id first
  }

  test("longer documents score below shorter ones at equal tf (length normalization)") {
    val d = Seq(
      (1L, "apple x"),
      (2L, "apple x x x x x x x x x x x x x x x")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(d, Seq("apple"), k = 2)
      .select("doc_id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 2L))
  }

  test("doc lengths derived from the landed postings equal the direct tokenization") {
    // the warehouse builds bm25_doclens as Σ tf over bm25_postings —
    // the two derivations must agree for every doc
    val fromPostings = graft.warehouse.Warehouse
      .buildBm25DocLens(TextAnalysis.bm25Postings(docs))
      .as[(Long, Long)].collect().toSet
    val direct = TextAnalysis.bm25DocLens(docs).as[(Long, Long)].collect().toSet
    assert(fromPostings == direct)
    assert(direct == Set((1L, 3L), (2L, 2L), (3L, 4L), (4L, 2L)))
  }

  test("per-term top-k ranks and emits the exact e9 truncation") {
    val out = TextAnalysis.bm25TopkPerTerm(docs, Seq("apple", "banana"), k = 10)
      .select("term", "rank", "doc_id", "bm25_e9")
      .as[(String, Long, Long, Long)].collect().toSeq
    // partials (e12, from the hand computation above) div 1000:
    // apple: d1 1_340_720e6, d2 1_125_581e6; banana: d3 1_568_881e6, d1 964_143e6
    assert(out == Seq(
      ("apple", 1L, 1L, 1340720000L),
      ("apple", 2L, 2L, 1125581000L),
      ("banana", 1L, 3L, 1568881000L),
      ("banana", 2L, 1L, 964143000L)))
  }
}
