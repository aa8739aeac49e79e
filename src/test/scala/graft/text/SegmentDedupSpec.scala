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

  // ---- scrubExactSubstr ----

  private def scrub(docs: Seq[(Long, String)], l: Int = 3): Map[Long, (Long, Long, String)] =
    SegmentDedup.scrubExactSubstr(docs.toDF("doc_id", "text"), minTokens = l)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("scrub: corpus with no repeated L-gram is identity") {
    val got = scrub(Seq((1L, "a b c d"), (2L, "e f g h")))
    assert(got(1L) == ((4L, 0L, "a b c d")))
    assert(got(2L) == ((4L, 0L, "e f g h")))
  }

  test("scrub: repeated span removed from the later doc, first survives") {
    val got = scrub(Seq((1L, "a b c d e"), (2L, "x a b c y")))
    assert(got(1L) == ((5L, 0L, "a b c d e")))
    assert(got(2L) == ((5L, 3L, "x y"))) // the shared 3-gram "a b c" goes
  }

  test("scrub: overlapping duplicated grams merge into one maximal span") {
    // "a b c d" in doc 2 repeats doc 1's run: two overlapping 3-grams
    // ("a b c", "b c d") cover the union [positions 2..5], not 6 tokens
    val got = scrub(Seq((1L, "a b c d"), (2L, "x a b c d y")))
    assert(got(2L) == ((6L, 4L, "x y")))
  }

  test("scrub: within-doc repeat keeps only the earliest occurrence") {
    val got = scrub(Seq((1L, "p q r s p q r")))
    // grams: "p q r"(1,5) dup at 5; "q r s"(2) unique; "r s p"(3) unique; "s p q"(4) unique
    assert(got(1L) == ((7L, 3L, "p q r s")))
  }

  test("scrub: docs shorter than L never lose tokens") {
    val got = scrub(Seq((1L, "a b"), (2L, "a b"), (3L, "")))
    assert(got(1L) == ((2L, 0L, "a b")))
    assert(got(2L) == ((2L, 0L, "a b")))
    assert(got(3L) == ((0L, 0L, "")))
  }
}
