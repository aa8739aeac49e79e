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

  test("phraseSearch counts consecutive-token occurrences, including overlaps") {
    val docs = Seq(
      (1L, "a join hash b"),            // one occurrence mid-doc
      (2L, "join hash join hash"),      // adjacent occurrences share no token
      (3L, "join x hash"),              // not adjacent
      (4L, "hash join"),                // wrong order
      (5L, "join  hash"),               // double space: still token-adjacent
      (6L, "join")                      // too short
    ).toDF("doc_id", "text")
    val got = InvertedIndex.phraseSearch(docs, Seq("join", "hash"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 2L), (5L, 1L)))
  }

  test("phraseSearch counts self-overlapping phrases by position") {
    val docs = Seq((1L, "a a a"), (2L, "a b a")).toDF("doc_id", "text")
    val got = InvertedIndex.phraseSearch(docs, Seq("a", "a"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L))) // positions (1,2) and (2,3)
  }

  test("phraseSearch chains joins for phrases longer than two tokens") {
    val docs = Seq(
      (1L, "x join hash value y"),
      (2L, "join hash x value")).toDF("doc_id", "text")
    val got = InvertedIndex.phraseSearch(docs, Seq("join", "hash", "value"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L)))
  }
}
