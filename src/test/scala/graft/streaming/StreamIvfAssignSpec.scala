package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.vector.Similarity

class StreamIvfAssignSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"sivf_$tag").toString

  private val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private val codebook = Similarity.codebookDf(spark,
    Similarity.trainIvfCentroids(emb, ncells = 4, iters = 2, sampleMod = 2))

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.select("vec_id", "cell", "rn").as[(Long, Long, Int)].collect().toSet

  test("streamed assignment over batches equals the one-shot batch assignment") {
    val path = tmp("a") + "/assign"
    // three modulo batches cover every vector exactly once
    for (b <- 0 to 2)
      StreamIvfAssign.mergeBatch(spark,
        emb.where(pmod(col("vec_id"), lit(3)) === b), b.toLong, codebook, path)
    val streamed = canon(spark.read.parquet(path))
    // the maintained table's law is the ARTIFACT rule (selector +
    // IvfAssignMaxRank), not the unbounded flat ranking
    val oneShot = canon(Similarity.cellRankAuto(emb, codebook,
      probes = graft.warehouse.Warehouse.IvfAssignMaxRank))
    assert(streamed == oneShot)
    assert(streamed.nonEmpty)
  }

  test("rank depth is bounded at IvfAssignMaxRank even for wide codebooks") {
    // 12-cell codebook > maxRank 8: the maintained table must truncate
    // exactly like buildIvfAssign's cold rebuild (slice before explode)
    val wide = Similarity.codebookDf(spark,
      Similarity.trainIvfCentroids(emb, ncells = 12, iters = 1, sampleMod = 1))
    val path = tmp("w") + "/assign"
    StreamIvfAssign.mergeBatch(spark, emb, 0L, wide, path)
    val got = spark.read.parquet(path)
    val maxRank = graft.warehouse.Warehouse.IvfAssignMaxRank
    assert(got.agg(max(col("rn"))).head.getInt(0) == maxRank)
    assert(canon(got) ==
      canon(Similarity.cellAssignments(emb, wide).where(col("rn") <= maxRank)))
  }

  test("redelivered batch is a no-op (no duplicate assignment rows)") {
    val path = tmp("r") + "/assign"
    val b0 = emb.where(col("vec_id") < 10)
    StreamIvfAssign.mergeBatch(spark, b0, 0L, codebook, path)
    val before = spark.read.parquet(path).count()
    StreamIvfAssign.mergeBatch(spark, b0, 0L, codebook, path) // replay
    assert(spark.read.parquet(path).count() == before)
  }
}
