package graft.streaming

import graft.SparkSpec
import graft.text.Chunking
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Map-only operators (chunking, stats, fingerprints, encode, PII
  * redaction) are streaming-safe BY CONSTRUCTION — no shuffle, no
  * state, no watermark required. This pins the contract: the exact
  * batch transform applied to a streaming DataFrame yields the same
  * rows, append-mode, one output batch per input batch. */
class StreamChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("tokenWindows applies unchanged to a streaming source; rows equal the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = Chunking.tokenWindows(in.toDF.toDF("doc_id", "text"), window = 4, stride = 2)
    val q = out.writeStream.format("memory").queryName("stream_chunks")
      .outputMode(OutputMode.Append()).start()
    try {
      val rows = Seq(
        (1L, "a b c d e f g"),
        (2L, "one two"),
        (3L, ""))
      in.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_chunks")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      val batch = Chunking.tokenWindows(rows.toDF("doc_id", "text"), window = 4, stride = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      assert(streamed == batch)
      assert(streamed.exists(_._1 == 1L) && streamed.exists(_._1 == 3L))
    } finally q.stop()
  }

  test("Pii.scrub applies unchanged to a streaming source; rows equal the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = graft.text.Pii.scrub(in.toDF.toDF("doc_id", "text"))
      .select("doc_id", "n_emails", "n_phones", "redacted")
    val q = out.writeStream.format("memory").queryName("stream_pii")
      .outputMode(OutputMode.Append()).start()
    try {
      val rows = Seq(
        (1L, "mail a@b.co or call 555-123-4567"),
        (2L, "nothing sensitive here"))
      in.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_pii")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      val batch = graft.text.Pii.scrub(rows.toDF("doc_id", "text"))
        .select("doc_id", "n_emails", "n_phones", "redacted")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      assert(streamed == batch)
      assert(streamed.contains((1L, 1L, 1L, "mail <EMAIL> or call <PHONE>")))
    } finally q.stop()
  }
}
