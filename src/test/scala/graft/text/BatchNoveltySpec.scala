package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[SegmentDedup.batchNovelty]] — the ingestion gram-novelty monitor
  * (q158). Pins known/novel classification, the bloom-front exactness
  * contract (bit-identical with or without), distinct-novel counting,
  * and the zero-filled source enumeration. */
class BatchNoveltySpec extends SparkSpec {
  import spark.implicits._

  private val eight = "a b c d e f g h"          // one 8-gram
  private val other = "p q r s t u v w"          // a different 8-gram

  test("grams shared with the corpus are known; unseen grams are novel") {
    val corpus = Seq((1L, eight)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, eight, "web"),   // 1 gram, known
      (11L, other, "web"),   // 1 gram, novel
      (12L, "x y", "lab"))   // too short: no grams
      .toDF("doc_id", "text", "source")
    val out = SegmentDedup.batchNovelty(
      SegmentDedup.gramOccurrences(batch.select(col("doc_id"), col("text"))),
      batch.select(col("doc_id"), col("source")),
      SegmentDedup.gramIndex(corpus))
      .select("source", "n_grams", "n_novel", "novelty_ppm", "n_distinct_novel")
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out == Seq(
      ("lab", 0L, 0L, 0L, 0L),
      ("web", 2L, 1L, 500000L, 1L)))
  }

  test("bloom front changes nothing: counts bit-identical with and without") {
    val corpus = Seq((1L, eight), (2L, s"$eight i j")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, s"$eight $other", "web"),
      (11L, other, "web"),
      (12L, s"z $eight", "lab")).toDF("doc_id", "text", "source")
    val index = SegmentDedup.gramIndex(corpus)
    val bloom = graft.operators.BloomPrune.sketchBloomBytes(
      index, "h", math.max(index.count(), 1L), 0.01)
    val grams = SegmentDedup.gramOccurrences(batch.select(col("doc_id"), col("text")))
    val srcs = batch.select(col("doc_id"), col("source"))
    val without = SegmentDedup.batchNovelty(grams, srcs, index, None).collect().toSeq
    val withB = SegmentDedup.batchNovelty(grams, srcs, index, Some(bloom)).collect().toSeq
    assert(without == withB)
  }

  test("occurrence vs distinct novelty: a repeated novel gram counts once distinct") {
    val corpus = Seq((1L, eight)).toDF("doc_id", "text")
    // the same novel 8-gram appears in two batch docs → 2 occurrences, 1 distinct
    val batch = Seq((10L, other, "web"), (11L, other, "web"))
      .toDF("doc_id", "text", "source")
    val out = SegmentDedup.batchNovelty(
      SegmentDedup.gramOccurrences(batch.select(col("doc_id"), col("text"))),
      batch.select(col("doc_id"), col("source")),
      SegmentDedup.gramIndex(corpus))
      .select("n_grams", "n_novel", "n_distinct_novel")
      .as[(Long, Long, Long)].head()
    assert(out == ((2L, 2L, 1L)))
  }
}
