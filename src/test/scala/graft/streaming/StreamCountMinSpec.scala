package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.text.CountMin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamCountMinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-built counters equal batch-built counters cell for cell") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val out = StreamCountMin.windowedSketch(
      in.toDF.toDF("tok", "ingest_ts"), depth = 3, width = 64)
    val q = out.writeStream.format("memory").queryName("stream_cms")
      .outputMode(OutputMode.Append()).start()
    try {
      val hour1 = Seq("the", "cat", "the", "sat", "cat", "the")
        .zipWithIndex.map { case (w, i) => (w, ts(f"2024-01-01 10:${i}%02d:00")) }
      in.addData(hour1: _*)
      // an event far past the watermark horizon closes the 10:00 window
      in.addData(("later", ts("2024-01-01 13:00:00")))
      q.processAllAvailable()

      val streamed = spark.table("stream_cms")
        .where($"window_start" === ts("2024-01-01 10:00:00"))
        .select($"r", $"bucket", $"cnt").as[(Int, Long, Long)].collect().toSet
      val batch = CountMin.sketch(
          hour1.map(_._1).toDF("tok"), depth = 3, width = 64)
        .as[(Int, Long, Long)].collect().toSet
      assert(streamed.nonEmpty)
      assert(streamed == batch,
        s"stream cells $streamed must equal batch cells $batch")
    } finally q.stop()
  }

  test("state is the sketch: cells per window bounded by depth x width") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val out = StreamCountMin.windowedSketch(
      in.toDF.toDF("tok", "ingest_ts"), depth = 2, width = 4)
    val q = out.writeStream.format("memory").queryName("stream_cms_bound")
      .outputMode(OutputMode.Append()).start()
    try {
      val many = (0 until 200).map(i => (s"tok$i", ts(f"2024-01-01 10:${i % 60}%02d:00")))
      in.addData(many: _*)
      in.addData(("later", ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      val cells = spark.table("stream_cms_bound")
        .where($"window_start" === ts("2024-01-01 10:00:00")).count()
      assert(cells <= 8, s"cells=$cells must be bounded by depth*width=8")
    } finally q.stop()
  }
}
