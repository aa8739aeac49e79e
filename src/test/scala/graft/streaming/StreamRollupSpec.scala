package graft.streaming

import graft.SparkSpec
import graft.operators.IncrementalAgg
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamRollupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"rollup_$tag").toString

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Seq[Long])] =
    df.select("g", "cnt", "hs").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2).toList: Seq[Long])).toSet

  test("streamed state equals a from-scratch recompute over all ingested rows") {
    implicit val sqlCtx = spark.sqlContext
    val state = tmp("state") + "/st"
    val in = MemoryStream[(String, Long)]
    val q = StreamRollup.sink(spark, in.toDF.toDF("g", "h"),
      "g", "h", state, tmp("ckpt"), k = 4)
    val all = Seq(
      Seq(("a", 1L), ("a", 2L), ("b", 9L)),
      Seq(("a", 2L), ("b", 7L), ("b", 8L)),
      Seq(("a", 5L), ("c", 3L)))
    try {
      all.foreach { batch => in.addData(batch: _*); q.processAllAvailable() }
      val streamed = canon(spark.read.parquet(state))
      val direct = canon(IncrementalAgg.state(all.flatten.toDF("g", "h"), "g", "h", 4))
      assert(streamed == direct)
    } finally q.stop()
  }

  test("redelivered batch is a no-op (exactly-once counts under replay)") {
    val state = tmp("replay") + "/st"
    val b0 = Seq(("a", 1L), ("a", 2L)).toDF("g", "h")
    val b1 = Seq(("a", 3L)).toDF("g", "h")
    StreamRollup.mergeBatch(spark, b0, 0L, state, "g", "h", 4)
    StreamRollup.mergeBatch(spark, b1, 1L, state, "g", "h", 4)
    val before = canon(spark.read.parquet(state))
    StreamRollup.mergeBatch(spark, b1, 1L, state, "g", "h", 4) // replay
    assert(canon(spark.read.parquet(state)) == before)
    assert(before == Set(("a", 3L, Seq(1L, 2L, 3L))))
  }

  test("read attaches the KMV estimate to the maintained state") {
    val state = tmp("est") + "/st"
    StreamRollup.mergeBatch(spark,
      Seq(("a", 10L), ("a", 20L)).toDF("g", "h"), 0L, state, "g", "h", 4)
    val got = StreamRollup.read(spark, state, 4)
      .select(col("g"), col("kmv_estimate")).collect().head
    assert(got.getString(0) == "a" && got.getDouble(1) == 2.0)
  }
}
