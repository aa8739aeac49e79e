package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.text.TextDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming docs are flagged against the static corpus index, exact copies score 1.0") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog and runs far away today"),
      (200L, "completely unrelated corpus document about spark query planning internals"))
      .toDF("doc_id", "text")
    val corpusShingled = TextDedup.shingled(corpus).persist()
    corpusShingled.count()

    val in = MemoryStream[(Long, String, Timestamp)]
    val out = StreamNearDup.flagAgainstCorpus(
      in.toDF.toDF("doc_id", "text", "ingest_ts"), corpusShingled)
    val q = out.writeStream.format("memory").queryName("stream_neardup")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        // exact copy of corpus doc 100 → jaccard 1.0
        (1L, "the quick brown fox jumps over the lazy dog and runs far away today", ts("2024-01-01 10:00:00")),
        // near copy of corpus doc 100 (one word changed)
        (2L, "the quick brown fox jumps over the lazy cat and runs far away today", ts("2024-01-01 10:01:00")),
        // nothing like the corpus
        (3L, "totally novel text with no overlap whatsoever here at all right now", ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      val rows = spark.table("stream_neardup")
        .select($"doc_id", $"corpus_doc", $"jaccard").as[(Long, Long, Double)].collect()
      val byDoc = rows.groupBy(_._1)
      assert(byDoc.contains(1L) && byDoc(1L).exists(r => r._2 == 100L && r._3 == 1.0),
        s"exact copy must flag against corpus doc 100 with jaccard 1.0: ${rows.toSeq}")
      assert(byDoc.contains(2L) && byDoc(2L).forall(_._2 == 100L),
        s"near copy must flag only against corpus doc 100: ${rows.toSeq}")
      assert(!byDoc.contains(3L), s"novel doc must not flag: ${rows.toSeq}")
    } finally { q.stop(); corpusShingled.unpersist() }
  }

  test("band-collision duplicates collapse to one pair per (doc, corpus_doc)") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val corpusShingled = TextDedup.shingled(corpus).persist()
    corpusShingled.count()
    val in = MemoryStream[(Long, String, Timestamp)]
    val out = StreamNearDup.flagAgainstCorpus(
      in.toDF.toDF("doc_id", "text", "ingest_ts"), corpusShingled)
    val q = out.writeStream.format("memory").queryName("stream_neardup2")
      .outputMode(OutputMode.Append()).start()
    try {
      // identical text collides in ALL 8 bands — output must still be 1 row
      in.addData((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      val rows = spark.table("stream_neardup2").collect()
      assert(rows.length == 1, s"expected a single deduped pair, got ${rows.length}")
    } finally { q.stop(); corpusShingled.unpersist() }
  }

  test("stream ≡ batch: flagged pairs equal minhashLshPairsBetween on the corpus split") {
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).where(col("text").isNotNull)
    val newDocs = docs.where(pmod(col("doc_id"), lit(10)) === 7)
    val oldDocs = docs.where(pmod(col("doc_id"), lit(10)) =!= 7)
    val batch = TextDedup.minhashLshPairsBetween(newDocs, oldDocs)
      .select("new_id", "old_id").as[(Long, Long)].collect().toSet

    val corpusShingled = TextDedup.shingled(oldDocs).persist()
    corpusShingled.count()
    val in = MemoryStream[(Long, String, Timestamp)]
    val out = StreamNearDup.flagAgainstCorpus(
      in.toDF.toDF("doc_id", "text", "ingest_ts"), corpusShingled)
    val q = out.writeStream.format("memory").queryName("stream_neardup3")
      .outputMode(OutputMode.Append()).start()
    try {
      val batchRows = newDocs.as[(Long, String)].collect()
        .map { case (id, t) => (id, t, ts("2024-01-01 10:00:00")) }
      in.addData(batchRows.toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_neardup3")
        .select($"doc_id", $"corpus_doc").as[(Long, Long)].collect().toSet
      assert(batch.nonEmpty, "split should contain cross-set near-duplicates")
      assert(streamed == batch,
        s"stream missed ${batch.diff(streamed)} / extra ${streamed.diff(batch)}")
    } finally { q.stop(); corpusShingled.unpersist() }
  }
}
