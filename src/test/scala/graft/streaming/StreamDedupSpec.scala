package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming dedup admits first-seen normalized docs and drops in-horizon repeats") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val out = StreamDedup.firstSeenByNormHash(
      in.toDF.toDF("doc_id", "text", "ingest_ts"), watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("stream_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (1L, "The cat sat.", ts("2024-01-01 10:00:00")),
        (2L, "the CAT sat",  ts("2024-01-01 10:01:00")), // same normalized text
        (3L, "a different doc", ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      // later batch, still inside the watermark horizon: repeat dropped
      in.addData((4L, "THE cat SAT?", ts("2024-01-01 10:30:00")))
      q.processAllAvailable()
      val admitted = spark.table("stream_dedup").select($"doc_id").as[Long].collect().toSet
      assert(admitted.intersect(Set(2L, 4L)).isEmpty, "in-horizon repeats must be dropped")
      assert(admitted.contains(3L))
      assert(admitted.exists(Set(1L)), "first occurrence must be admitted")
    } finally q.stop()
  }
}
