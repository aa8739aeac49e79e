package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.text.TextAnalysis

class StreamBm25Spec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"sbm25_$tag").toString

  private def canonTopk(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.select("doc_id", "n_terms_hit", "bm25_e12")
      .as[(Long, Long, Long)].collect().toSeq

  test("streamed index serves BM25 identical to the one-shot batch index") {
    implicit val sqlCtx = spark.sqlContext
    val postings = tmp("p") + "/postings"
    val doclens = tmp("l") + "/doclens"
    val in = MemoryStream[(Long, String)]
    val q = StreamBm25.sink(spark, in.toDF.toDF("doc_id", "text"),
      postings, doclens, tmp("ck"))
    val batches = Seq(
      Seq((1L, "apple banana apple"), (2L, "apple cherry")),
      Seq((3L, "banana banana banana banana")),
      Seq((4L, "durian fig")))
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val streamed = TextAnalysis.bm25FromIndex(
      spark.read.parquet(postings), spark.read.parquet(doclens),
      Seq("apple", "banana"), k = 20)
    val oneShot = TextAnalysis.bm25(
      batches.flatten.toDF("doc_id", "text"), Seq("apple", "banana"), k = 20)
    assert(canonTopk(streamed) == canonTopk(oneShot))
    // not vacuous: the Bm25Spec hand computation holds on streamed state
    assert(canonTopk(streamed).head == ((1L, 2L, 2304863000000L)))
  }

  test("redelivered batch is a no-op (tf must not double)") {
    val postings = tmp("rp") + "/postings"
    val doclens = tmp("rl") + "/doclens"
    val b0 = Seq((1L, "apple banana apple")).toDF("doc_id", "text")
    val b1 = Seq((2L, "apple cherry")).toDF("doc_id", "text")
    StreamBm25.mergeBatch(spark, b0, 0L, postings, doclens)
    StreamBm25.mergeBatch(spark, b1, 1L, postings, doclens)
    val before = spark.read.parquet(postings)
      .select("tok", "doc_id", "tf").as[(String, Long, Long)].collect().toSet
    StreamBm25.mergeBatch(spark, b1, 1L, postings, doclens) // replay
    val after = spark.read.parquet(postings)
      .select("tok", "doc_id", "tf").as[(String, Long, Long)].collect().toSet
    assert(after == before)
    assert(before.contains(("apple", 1L, 2L)) && before.contains(("apple", 2L, 1L)))
    // doclens stays consistent with the postings (Σ tf)
    val lens = spark.read.parquet(doclens)
      .select("doc_id", "len").as[(Long, Long)].collect().toMap
    assert(lens == Map(1L -> 3L, 2L -> 2L))
  }
}
