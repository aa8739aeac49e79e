package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.operators.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamSessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // two users, gaps straddling 30 min (never exactly on the boundary)
  private val events = Seq(
    (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 10:10:00"), // u1 s1
    (1L, "2024-01-01 11:00:00"),                              // u1 s2 (50m gap)
    (2L, "2024-01-01 10:05:00"),                              // u2 s1
    (2L, "2024-01-01 10:45:00"), (2L, "2024-01-01 10:50:00")  // u2 s2 (40m gap)
  ).map { case (u, t) => (u, ts(t)) }

  test("finalized stream sessions equal batch sessions on the same events") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val q = StreamSessionize.byGap(in.toDF.toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("stream_sess")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(events: _*)
      // far-future event pushes the watermark and finalizes everything above
      in.addData((9L, ts("2024-01-02 00:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("stream_sess")
        .where($"user_id" < 9L)
        .select($"user_id", $"session_start", $"session_end", $"n_events")
        .as[(Long, String, String, Long)].collect().toSet
      val batch = Sessionize.byGap(
          events.zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong) }
            .toDF("user_id", "ts", "event_id"))
        .select($"user_id", $"session_start", $"session_end", $"n_events")
        .as[(Long, String, String, Long)].collect().toSet
      assert(streamed == batch, s"stream $streamed\nbatch $batch")
      assert(streamed.size == 4)
    } finally q.stop()
  }
}
