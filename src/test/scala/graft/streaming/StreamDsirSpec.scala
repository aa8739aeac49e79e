package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.text.Curation

class StreamDsirSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"sdsir_$tag").toString

  private val batches = Seq(
    Seq((1L, "alpha beta alpha beta", "en"), (2L, "gamma delta gamma", "de")),
    Seq((3L, "alpha beta gamma delta", "en")),
    Seq((4L, "delta gamma delta", "de"), (5L, "solo", "en")))

  private def countsOf(path: String): Map[Long, (Long, Long)] =
    spark.read.parquet(path).select("feat", "cnt_r", "cnt_t")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("streamed counts equal the cold build over the union corpus; scorer agrees") {
    implicit val sqlCtx = spark.sqlContext
    val counts = tmp("c") + "/dsir_counts"
    val in = MemoryStream[(Long, String, String)]
    val q = StreamDsir.sink(spark, in.toDF.toDF("doc_id", "text", "lang"),
      counts, tmp("ck"))
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val all = batches.flatten.toDF("doc_id", "text", "lang")
    val cold = Curation.dsirCounts(Curation.dsirFeatures(all))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(countsOf(counts) == cold)
    // the maintained table drives the incremental scorer identically
    // to a cold build — the contract q153 depends on
    val probe = Seq((9L, "alpha beta")).toDF("doc_id", "text")
    val viaStream = Curation.dsirScoreAgainstCounts(
        Curation.dsirFeatures(probe),
        spark.read.parquet(counts).select("feat", "cnt_r", "cnt_t"))
      .select("doc_id", "score_ppm").as[(Long, Long)].collect().toSeq
    val viaCold = Curation.dsirScoreAgainstCounts(
        Curation.dsirFeatures(probe),
        Curation.dsirCounts(Curation.dsirFeatures(all)))
      .select("doc_id", "score_ppm").as[(Long, Long)].collect().toSeq
    assert(viaStream == viaCold && viaStream.nonEmpty)
  }

  test("redelivered batch is a no-op (counts must not double)") {
    val counts = tmp("r") + "/dsir_counts"
    val b0 = batches(0).toDF("doc_id", "text", "lang")
    val b1 = batches(1).toDF("doc_id", "text", "lang")
    StreamDsir.mergeBatch(spark, b0, 0L, counts)
    StreamDsir.mergeBatch(spark, b1, 1L, counts)
    val before = countsOf(counts)
    StreamDsir.mergeBatch(spark, b1, 1L, counts) // replay
    assert(countsOf(counts) == before)
    // totals audit: raw occurrences = Σ bigrams of both batches
    val expTotal = (batches(0) ++ batches(1))
      .map(_._2.split(" ").count(_.nonEmpty)).map(n => math.max(0, n - 1)).sum
    assert(before.values.map(_._1).sum == expTotal)
  }
}
