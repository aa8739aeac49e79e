package graft.text

import graft.SparkSpec

class SegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], segTokens: Int = 2): Map[Long, (Long, Long, String)] =
    SegmentDedup.dedupSegments(docs.toDF("doc_id", "text"), segTokens)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("all-unique segments keep every document intact") {
    val got = run(Seq((1L, "a b c d"), (2L, "e f g h")))
    assert(got(1L) == ((2L, 2L, "a b c d")))
    assert(got(2L) == ((2L, 2L, "e f g h")))
  }

  test("segment repeated across documents survives only in the first (doc order)") {
    val got = run(Seq((1L, "a b c d"), (2L, "x y a b")))
    assert(got(1L) == ((2L, 2L, "a b c d")))
    assert(got(2L) == ((2L, 1L, "x y"))) // "a b" deduped away
  }

  test("segment repeated within one document keeps the earliest occurrence") {
    val got = run(Seq((1L, "p q p q r")))
    assert(got(1L) == ((3L, 2L, "p q r")))
  }

  test("middle-segment removal concatenates around the gap") {
    val got = run(Seq((1L, "d d"), (2L, "a b d d x y")))
    assert(got(2L) == ((3L, 2L, "a b x y")))
  }

  test("no document vanishes: empty and whitespace-only docs stay as rows") {
    val got = run(Seq((1L, ""), (2L, "   "), (3L, "w z")))
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((1L, 1L, ""))) // first empty segment is the keeper
    assert(got(2L) == ((1L, 0L, ""))) // duplicate empty segment deduped
    assert(got(3L) == ((1L, 1L, "w z")))
  }

  test("short tail segment participates in dedup like any other") {
    // tail "c" of doc 1 equals the whole of doc 2's only segment
    val got = run(Seq((1L, "a b c"), (2L, "c")))
    assert(got(1L) == ((2L, 2L, "a b c")))
    assert(got(2L) == ((1L, 0L, "")))
  }
}
