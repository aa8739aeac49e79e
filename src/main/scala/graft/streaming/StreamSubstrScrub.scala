package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.Ingest
import graft.text.SegmentDedup

/** Continuous exact-substring dedup — the streaming deployment of
  * [[SegmentDedup.scrubExactSubstrAgainst]] (q123): each arriving
  * micro-batch of documents is scrubbed against the maintained gram
  * index (every ≥L-token span already seen anywhere in the ingested
  * history is deleted; within the batch the first occurrence survives),
  * then the batch's grams are unioned into the index. Semantics are
  * IDENTICAL to replaying the batches sequentially through the batch
  * operator — spec-gated, the stream≡batch discipline of
  * [[StreamRollup]]/[[StreamCentroid]].
  *
  * State is the parquet gram index (column `h`, 60-bit hashes) plus the
  * last-merged batch id — restart-safe, readable by any batch consumer,
  * nothing in the streaming state store. At 100 TB the index is the
  * materialized artifact the batch pipeline already maintains; the
  * stream just appends to it (here: atomic overwrite-swap per batch,
  * the demo-scale equivalent).
  *
  * Exactly-once: scrubbing is NOT replay-idempotent against a mutated
  * index — a redelivered batch would find its own grams in the index
  * and scrub itself to nothing. The ledger guard makes redelivery a
  * no-op (same pattern as [[StreamRollup]], spec-gated). */
object StreamSubstrScrub {

  /** Scrub one batch against the index at `indexPath`, append the
    * scrubbed rows to `outPath`, merge the batch's grams into the
    * index — exactly once per batchId. */
  def mergeBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 indexPath: String, outPath: String, minTokens: Int = 8): Unit = {
    val existing =
      if (Ingest.ready(spark, indexPath)) Some(spark.read.parquet(indexPath))
      else None
    val lastMerged = existing
      .flatMap(df => Option(df.agg(max(col("last_batch"))).head.get(0)))
      .map(_.asInstanceOf[Long]).getOrElse(-1L)
    if (batchId > lastMerged) {
      val index = existing.map(_.select(col("h")))
        .getOrElse(spark.range(0).select(col("id").as("h")))
      val scrubbed = SegmentDedup
        .scrubExactSubstrAgainstIndex(batch, index, minTokens)
        .withColumn("batch_id", lit(batchId))
      // output first: if we crash between the two writes, the ledger
      // still points at the PREVIOUS batch, so redelivery rewrites this
      // batch's output (overwrite of its own partition would also work)
      // and then lands the index — never an index without its output
      scrubbed.write.mode("append").parquet(outPath)
      val merged = index
        .unionByName(SegmentDedup.gramIndex(batch, minTokens))
        .distinct()
      Ingest.overwriteSwap(spark, merged.withColumn("last_batch", lit(batchId)), indexPath)
    }
  }

  /** Attach the continuously-scrubbing sink. `docs` is a streaming
    * DataFrame carrying (doc_id, text). */
  def sink(spark: SparkSession, docs: DataFrame, indexPath: String,
           outPath: String, checkpointDir: String, minTokens: Int = 8): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        mergeBatch(spark, batch.toDF(), batchId, indexPath, outPath, minTokens)
      }
      .start()
}
