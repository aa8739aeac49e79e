package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def toEmb(rows: Seq[(Long, Int, Seq[Double])]) =
    rows.map { case (id, l, v) => (id, l, v.map(_.toFloat).toArray) }
      .toDF("vec_id", "label", "embedding")

  test("semanticDedup drops the higher id of each in-cell near-dup with its lowest-id witness") {
    val emb = toEmb(Seq(
      (1L, 0, Seq(1.0, 0.01)),   // cell 0, canonical
      (2L, 0, Seq(1.0, 0.02)),   // cell 0, ≈ v1 → dropped, witness 1
      (3L, 0, Seq(0.01, 1.0)),   // cell 1, canonical
      (4L, 0, Seq(0.02, 1.0)),   // cell 1, ≈ v3 → dropped, witness 3
      (5L, 0, Seq(1.0, -1.0)))) // cell 0 but far from v1/v2 at τ=0.9 → kept
    val cb = Similarity.codebookDf(spark, Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    val out = Similarity.semanticDedup(emb, cb, threshold = 0.9)
      .select("dropped", "witness", "n_witnesses").as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((2L, 1L, 1L), (4L, 3L, 1L)))
  }

  test("single-cell semanticDedup equals the brute-force all-pairs drop rule") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cb = Similarity.codebookDf(spark,
      Similarity.trainIvfCentroids(emb, ncells = 1, iters = 1))
    val got = Similarity.semanticDedup(emb, cb, threshold = 0.4)
      .select("dropped", "witness", "n_witnesses").as[(Long, Long, Long)]
      .collect().toSeq.sorted
    // brute force on the driver over the collected vectors (tiny sf)
    val vs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val want = (for {
      (bId, bv) <- vs
      witnesses = vs.filter { case (aId, av) => aId < bId && cos(av, bv) >= 0.4 }
      if witnesses.nonEmpty
    } yield (bId, witnesses.map(_._1).min, witnesses.size.toLong)).toSeq.sorted
    assert(got == want)
  }

  test("every witness pair really clears the threshold and precedes the dropped id") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cb = Similarity.codebookDf(spark, Similarity.trainIvfCentroids(emb))
    val out = Similarity.semanticDedup(emb, cb, threshold = 0.4)
    assert(out.where(col("witness") >= col("dropped")).count() == 0)
    assert(out.where(col("witness_cosine") < 0.4).count() == 0)
    assert(out.count() > 0) // the corpus has labeled clusters → non-trivial
  }
}
