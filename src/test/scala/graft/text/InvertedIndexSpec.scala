package graft.text

import graft.SparkSpec

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  test("postings are sorted, deduped per doc, normalized, and split by segment") {
    val docs = Seq(
      (3L, "Rust, rust RUST!"),     // dedups to one posting
      (1L, "spark and rust"),
      (250L, "rust again"),         // second segment at width 200
      (2L, "spark")).toDF("doc_id", "text")
    val got = InvertedIndex.postings(docs, segWidth = 200L)
      .collect().map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getString(3)))).toMap
    assert(got(("rust", 0L)) == (2L, "1,3"))
    assert(got(("rust", 1L)) == (1L, "250"))
    assert(got(("spark", 0L)) == (2L, "1,2"))
    assert(got(("again", 1L)) == (1L, "250"))
    assert(!got.keySet.exists(_._1 == "rust,")) // punctuation stripped
  }
}
