package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LabelOutliersSpec extends SparkSpec {
  import spark.implicits._

  private def toEmb(rows: Seq[(Long, Int, Seq[Double])]) =
    rows.map { case (id, l, v) => (id, l, v.map(_.toFloat).toArray) }
      .toDF("vec_id", "label", "embedding")

  test("the planted label-noise vector is the top outlier of its label") {
    val emb = toEmb(Seq(
      (1L, 0, Seq(1.0, 0.0)),
      (2L, 0, Seq(0.9, 0.1)),
      (3L, 0, Seq(0.95, 0.05)),
      (4L, 0, Seq(-1.0, 0.0)),  // planted: opposite of its labelmates
      (5L, 1, Seq(0.0, 1.0)),
      (6L, 1, Seq(0.1, 0.9))))
    val out = Similarity.labelOutliers(emb, k = 1)
      .select("label", "vec_id").as[(Int, Long)].collect().toSeq
    assert(out == Seq((0, 4L), (1, 6L)))
  }

  test("flagged vectors are exactly the k lowest centroid-cosines per label") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.labelOutliers(emb, k = 3).cache()
    val nLabels = emb.select(countDistinct(col("label"))).as[Long].head()
    assert(out.count() == nLabels * 3)
    // rank 1 is the minimum: no unflagged vector may score below a flagged one
    val worstFlagged = out.groupBy("label").agg(max(col("cosine")).as("c3"))
    val flaggedIds = out.select(col("label"), col("vec_id")).as[(Int, Long)].collect().toSet
    // recompute every cosine via a second labelOutliers run at k = corpus
    // size (bounded agg still, tiny corpus) and compare the cut line
    val n = emb.count().toInt
    val all = Similarity.labelOutliers(emb, k = n)
    val bad = all.join(worstFlagged, Seq("label"))
      .where(col("cosine") < col("c3"))
      .select(col("label"), col("vec_id")).as[(Int, Long)].collect()
      .filterNot(flaggedIds)
    assert(bad.isEmpty)
    out.unpersist()
  }

  test("ranks are 1..k ordered by ascending cosine with vec_id tie-break") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.labelOutliers(emb, k = 3)
      .select("label", "rank", "cosine").as[(Int, Int, Double)].collect()
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to rows.length).toSeq)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq)
    }
  }
}
