package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.text.Cooccur
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamCooccurSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-built edges equal batch-built edges weight for weight") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val out = StreamCooccur.windowedEdges(
      in.toDF.toDF("doc_id", "text", "ingest_ts"))
    val q = out.writeStream.format("memory").queryName("stream_cooc")
      .outputMode(OutputMode.Append()).start()
    try {
      val hour1 = Seq(
        (1L, "the cat sat on the mat"),
        (2L, "a cat and a dog"),
        (3L, "dup dup dup")
      ).zipWithIndex.map { case ((id, t), i) => (id, t, ts(f"2024-01-01 10:${i}%02d:00")) }
      in.addData(hour1: _*)
      // an event far past the watermark horizon closes the 10:00 window
      in.addData((9L, "later", ts("2024-01-01 13:00:00")))
      q.processAllAvailable()

      val streamed = spark.table("stream_cooc")
        .where($"window_start" === ts("2024-01-01 10:00:00"))
        .select($"tok_a", $"tok_b", $"w").as[(String, String, Long)].collect().toSet
      val batch = Cooccur.pairCounts(
          hour1.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text"))
        .as[(String, String, Long)].collect().toSet
      assert(streamed.nonEmpty)
      assert(streamed == batch,
        s"stream edges $streamed must equal batch edges $batch")
      // the self-pair convention carries over: "dup dup dup" emits (dup,dup)
      assert(streamed.exists(e => e._1 == "dup" && e._2 == "dup" && e._3 == 3L))
    } finally q.stop()
  }

  test("window tables merge into corpus edges by weight addition") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val out = StreamCooccur.windowedEdges(
      in.toDF.toDF("doc_id", "text", "ingest_ts"))
    val q = out.writeStream.format("memory").queryName("stream_cooc_merge")
      .outputMode(OutputMode.Append()).start()
    try {
      val d1 = (1L, "x y x", ts("2024-01-01 10:00:00"))
      val d2 = (2L, "x y", ts("2024-01-01 11:00:00"))
      in.addData(d1, d2)
      in.addData((9L, "later", ts("2024-01-01 14:00:00")))
      q.processAllAvailable()

      val merged = spark.table("stream_cooc_merge")
        .groupBy($"tok_a", $"tok_b").sum("w")
        .as[(String, String, Long)].collect().toSet
      val corpus = Cooccur.pairCounts(
          Seq((1L, "x y x"), (2L, "x y")).toDF("doc_id", "text"))
        .as[(String, String, Long)].collect().toSet
      assert(merged == corpus,
        s"summed window edges $merged must equal corpus edges $corpus")
    } finally q.stop()
  }
}
