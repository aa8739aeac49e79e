package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** The streaming SCD2 sink must produce exactly what the batch merge
  * produces for the same batches — micro-batch boundaries play the role
  * of days. */
class StreamScd2Spec extends SparkSpec {
  import spark.implicits._

  private val Sentinel = "2999-12-31 23:59:59"
  private def ts(s: String) = Timestamp.valueOf(s)

  test("micro-batches fold into the parquet dim exactly like daily batch merges") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_sscd").toString
    val dimPath = s"$base/dim_orders"
    val batchTimes = Map(0L -> "2019-01-01 00:00:00", 1L -> "2019-01-02 00:00:00")

    val in = MemoryStream[(Long, String, Timestamp, Long)]
    val events = in.toDF.toDF("id", "status", "event_time", "tiebreak")
    val q = StreamScd2.sink(spark, events, dimPath, s"$base/ckpt",
      bid => batchTimes.getOrElse(bid, "2019-01-03 00:00:00"))
    try {
      in.addData((100L, "created", ts("2019-01-01 09:00:00"), 1L))
      q.processAllAvailable()
      val day1 = spark.read.parquet(dimPath)
        .select(col("order_id"), col("status"), col("end_time").cast("string"))
        .as[(Long, String, String)].collect().toSet
      assert(day1 == Set((100L, "created", Sentinel)))

      in.addData((100L, "completed", ts("2019-01-02 11:00:00"), 2L))
      q.processAllAvailable()
      val day2 = spark.read.parquet(dimPath)
        .select(col("order_id"), col("status"),
          col("start_time").cast("string"), col("end_time").cast("string"))
        .as[(Long, String, String, String)].collect().toSet
      // batch-time close of the open version, new open version appended —
      // identical to the two-day ProcessOrders golden trace
      assert(day2 == Set(
        (100L, "created", "2019-01-01 09:00:00", "2019-01-02 00:00:00"),
        (100L, "completed", "2019-01-02 11:00:00", Sentinel)))
    } finally q.stop()
  }
}
