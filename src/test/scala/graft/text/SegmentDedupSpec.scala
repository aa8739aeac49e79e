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

  // ---- scrubExactSubstrAgainst (incremental) ----

  private def scrubIncr(batch: Seq[(Long, String)], corpus: Seq[(Long, String)],
                        l: Int = 3): Map[Long, (Long, Long, String)] =
    SegmentDedup.scrubExactSubstrAgainst(
        batch.toDF("doc_id", "text"), corpus.toDF("doc_id", "text"), minTokens = l)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("incr scrub: batch span present in the corpus is removed; corpus rows untouched") {
    val got = scrubIncr(batch = Seq((10L, "x a b c y")), corpus = Seq((1L, "a b c d")))
    assert(got.keySet == Set(10L)) // output is the batch only
    assert(got(10L) == ((5L, 3L, "x y")))
  }

  test("incr scrub: in-batch duplicate falls back to the first-occurrence rule") {
    val got = scrubIncr(
      batch = Seq((10L, "p q r z"), (11L, "w p q r")),
      corpus = Seq((1L, "unrelated text entirely here")))
    assert(got(10L) == ((4L, 0L, "p q r z"))) // first batch occurrence survives
    assert(got(11L) == ((4L, 3L, "w")))
  }

  test("incr scrub: corpus hit beats batch keeper — no batch occurrence survives") {
    val got = scrubIncr(
      batch = Seq((10L, "a b c"), (11L, "a b c")),
      corpus = Seq((1L, "z a b c z")))
    assert(got(10L) == ((3L, 3L, "")))
    assert(got(11L) == ((3L, 3L, "")))
  }

  test("source gram overlap: shared spans counted once per source pair, ppm vs min side") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "a b c d e", "s1"),  // grams: abc bcd cde
      (2L, "a b c x y", "s2"),  // grams: abc bcx cxy  -> shares abc with s1
      (3L, "a b c d q", "s2"),  // grams: abc bcd cdq  -> shares abc+bcd with s1
      (4L, "zz yy xx ww", "s3") // no overlap with anyone
    ).toDF("doc_id", "text", "source")
    val got = SegmentDedup.sourceGramOverlap(docs, minTokens = 3)
      .orderBy(col("src_x"), col("src_y")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // s1 grams {abc,bcd,cde}=3; s2 distinct grams {abc,bcx,cxy,bcd,cdq}=5
    // shared {abc,bcd}=2 → ppm = 2e6 div 3
    assert(got.toSeq == Seq(("s1", "s2", 2L, 3L, 5L, 666666L)))
  }

  test("incr scrub ≡ full scrub restricted to the batch when the corpus precedes it") {
    // corpus ids < batch ids → full-scrub keeper order equals the
    // incremental rule's "corpus always wins, then first-in-batch"
    val corpus = Seq((1L, "a b c d e"), (2L, "f g h i"))
    val batch = Seq((10L, "x a b c d"), (11L, "f g h i j"), (12L, "x a b c d"))
    val full = SegmentDedup.scrubExactSubstr((corpus ++ batch).toDF("doc_id", "text"), 3)
      .where($"doc_id" >= 10L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val incr = scrubIncr(batch, corpus)
    assert(incr == full)
  }

  test("planted mega-gram: hot-key salting engages and the scrub stays exact") {
    // one boilerplate 3-gram repeated in > HotGramOccurrences docs —
    // the skew case the dup-marking join salts: the audit must assign
    // it > 1 bucket, and the salted join must still emit exactly the
    // non-first occurrences (row-identity with the unsalted semantics)
    val n = (SegmentDedup.HotGramOccurrences + 200).toInt
    val docs = (0 until n).map(i => (i.toLong, s"x y z u$i")).toDF("doc_id", "text")
    val grams = SegmentDedup.gramOccurrences(docs, minTokens = 3)
    // the audit inside dupOccurrences: the planted gram is hot
    val hotCnt = grams.groupBy($"h").count().orderBy($"count".desc).head.getLong(1)
    assert(hotCnt == n, "the planted gram must dominate")
    val out = SegmentDedup.scrubExactSubstrFromGrams(docs, grams, minTokens = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 0 keeps everything; every later doc loses the covered span
    // [1,3] ("x y z") but keeps its unique tail token
    assert(out(0L) == ((4L, 0L, "x y z u0")))
    for (i <- Seq(1, 57, n - 1))
      assert(out(i.toLong) == ((4L, 3L, s"u$i")), s"doc $i wrong: ${out(i.toLong)}")
    // plan evidence: the dup-marking join runs through the salt
    val plan = SegmentDedup.scrubExactSubstrFromGrams(docs, grams, minTokens = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salted join structure missing:\n$plan")
  }

  test("incr scrub with the sketch bloom pre-filter is bit-identical to the unpruned scrub") {
    // the bloom is built over the index it fronts, so a member gram can
    // never be dropped (no false negatives) — the pruned probe feeds
    // the same semi-join the same true duplicates
    val corpus = Seq((1L, "a b c d e"), (2L, "f g h i")).toDF("doc_id", "text")
    val batch = Seq((10L, "x a b c d"), (11L, "f g h i j"), (12L, "p q r s"),
      (13L, "p q r s t")).toDF("doc_id", "text")
    val index = SegmentDedup.gramIndex(corpus, minTokens = 3)
    val bloom = graft.operators.BloomPrune.sketchBloomBytes(index, "h", 64L)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val unpruned = canon(SegmentDedup.scrubExactSubstrAgainstIndex(batch, index, 3))
    val pruned = canon(SegmentDedup.scrubExactSubstrAgainstIndex(batch, index, 3, Some(bloom)))
    assert(pruned == unpruned)
    // not vacuous: the corpus hits really scrub
    assert(unpruned.contains((10L, 5L, 4L, "x")))
  }
}
