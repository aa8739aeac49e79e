package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.text.TextDedup

/** Streaming document deduplication — the continuous front door of the
  * curation pipeline: documents arriving on a stream are dropped when a
  * document with the same normalized-text hash was already admitted
  * within the watermark horizon.
  *
  * Split of responsibilities (the standard lambda shape): this operator
  * owns IN-FLIGHT dedup with state bounded by the watermark — exact
  * global dedup over an unbounded stream is impossible in bounded
  * memory — while the batch operators ([[graft.text.TextDedup]]) own
  * the periodic full-corpus pass. Both share the same normalization
  * ([[TextDedup.normText]]) and md5-derived hash, so a document
  * admitted by the stream and later caught by the batch pass carries
  * the identical `norm_hash` in both ledgers.
  *
  * Scale: state per key is one hash + timestamp in the state store;
  * the watermark evicts it. `dropDuplicatesWithinWatermark` (not plain
  * `dropDuplicates`) is load-bearing — the unbounded variant's state
  * never shrinks on a 100 TB/day stream.
  */
object StreamDedup {

  /** First-seen documents per normalized-text hash within the watermark.
    * `docs`: streaming DataFrame with (doc_id, text, ingest_ts:
    * timestamp). Output adds `norm_hash`. */
  def firstSeenByNormHash(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("norm_hash", PortableHash.h60(TextDedup.normText(col("text"))))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("norm_hash")
}
