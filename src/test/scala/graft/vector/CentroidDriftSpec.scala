package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Similarity.centroidDrift]] — the per-label embedding-distribution
  * monitor (q156). Pins the fixed-point centroid exactness, the
  * one-side-empty sentinel, and the share arithmetic. */
class CentroidDriftSpec extends SparkSpec {
  import spark.implicits._

  private def toEmb(rows: Seq[(Long, Int, Seq[Double])]) =
    rows.map { case (id, l, v) => (id, l, v.map(_.toFloat).toArray) }
      .toDF("vec_id", "label", "embedding")

  test("identical distributions score cos_micro = 1000000; orthogonal score 0") {
    val corpus = toEmb(Seq(
      (1L, 0, Seq(1.0, 0.0)),
      (2L, 1, Seq(1.0, 0.0))))
    val batch = toEmb(Seq(
      (3L, 0, Seq(1.0, 0.0)),   // same direction as corpus label 0
      (4L, 1, Seq(0.0, 1.0))))  // orthogonal to corpus label 1
    val out = Similarity.centroidDrift(corpus, batch)
      .select("label", "centroid_cos_micro").as[(Int, Long)].collect().toMap
    assert(out(0) == 1000000L)
    assert(out(1) == 0L)
  }

  test("drift from the materialized sum state equals the direct form") {
    val corpus = toEmb(Seq(
      (1L, 0, Seq(0.9, 0.1)), (2L, 1, Seq(0.2, 0.8)), (3L, 0, Seq(0.7, -0.3))))
    val batch = toEmb(Seq(
      (10L, 0, Seq(0.8, 0.2)), (11L, 2, Seq(0.1, 0.9))))
    assertSameRows(
      Similarity.centroidDriftFromSums(Similarity.labelCentroidSums(corpus), batch),
      rowsOf(Similarity.centroidDrift(corpus, batch)))
  }

  test("a label missing on one side reports the sentinel and zero count") {
    val corpus = toEmb(Seq((1L, 0, Seq(1.0, 0.0))))
    val batch = toEmb(Seq((2L, 5, Seq(0.0, 1.0))))
    val rows = Similarity.centroidDrift(corpus, batch)
      .select("label", "n_corpus", "n_batch", "centroid_cos_micro")
      .as[(Int, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(rows == Seq((0, 1L, 0L, -2000000L), (5, 0L, 1L, -2000000L)))
  }

  test("share ppm arithmetic: integer floor of each side's label share") {
    val corpus = toEmb(Seq(
      (1L, 0, Seq(1.0, 0.0)), (2L, 0, Seq(0.9, 0.1)), (3L, 1, Seq(0.0, 1.0))))
    val batch = toEmb(Seq(
      (4L, 0, Seq(1.0, 0.0)), (5L, 1, Seq(0.0, 1.0))))
    val out = Similarity.centroidDrift(corpus, batch)
      .select("label", "corpus_share_ppm", "batch_share_ppm", "share_drift_ppm")
      .as[(Int, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // corpus: 2/3 and 1/3 → 666666 / 333333; batch: 1/2 each → 500000
    assert(out(0) == ((666666L, 500000L, 166666L)))
    assert(out(1) == ((333333L, 500000L, 166667L)))
  }

  test("centroid matches the labelOutliers fixed-point rule (partition-immune)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = emb.where(pmod(col("vec_id"), lit(10)) =!= 7)
    val batch = emb.where(pmod(col("vec_id"), lit(10)) === 7)
    val once = Similarity.centroidDrift(corpus, batch).collect().toSeq
    val rep = Similarity.centroidDrift(corpus.repartition(7), batch.repartition(3))
      .collect().toSeq
    assert(once == rep)
    // counts reconcile with the raw split
    val n = once.map(r => (r.getLong(1), r.getLong(2))).reduce((a, b) =>
      (a._1 + b._1, a._2 + b._2))
    assert(n._1 == corpus.count() && n._2 == batch.count())
  }
}
