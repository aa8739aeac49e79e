package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked window counts aggregate by event-time window") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val counts = StreamMetrics.eventCountsByWindow(
      in.toDF.toDF("ts", "event_type"), windowLen = "1 hour", watermark = "2 hours")
    val q = counts.writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(
        (ts("2024-01-01 10:05:00"), "click"),
        (ts("2024-01-01 10:45:00"), "click"),
        (ts("2024-01-01 11:05:00"), "view"))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select($"window_start".cast("string"), $"event_type", $"event_count")
        .as[(String, String, Long)].collect().toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00", "click", 2L),
        ("2024-01-01 11:00:00", "view", 1L)))
    } finally q.stop()
  }

  test("stateful current-status stream emits one row per status change across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamMetrics.OrderEvent]
    val statuses = StreamMetrics.currentStatusStream(spark, in.toDS())
    val q = statuses.writeStream.format("memory").queryName("cur_status")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        StreamMetrics.OrderEvent(100, "created", ts("2024-01-01 09:00:00")),
        StreamMetrics.OrderEvent(100, "created", ts("2024-01-01 09:10:00"))) // dup status → no change
      q.processAllAvailable()
      in.addData(StreamMetrics.OrderEvent(100, "completed", ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      val rows = spark.table("cur_status")
        .select($"order_id", $"status", $"since".cast("string"))
        .as[(Long, String, String)].collect().toSet
      assert(rows == Set(
        (100L, "created", "2024-01-01 09:00:00"),
        (100L, "completed", "2024-01-01 10:00:00")))
    } finally q.stop()
  }
}
