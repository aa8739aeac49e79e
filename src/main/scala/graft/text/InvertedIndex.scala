package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index construction: term → sorted posting list — the
  * backbone of corpus search, contamination probes
  * ([[TextDedup.containmentPairs]] is the join-form of the same
  * structure), and audit tooling ("which documents contain this
  * phrase?").
  *
  * Posting lists are SEGMENTED by doc-id range: the grouping key is
  * (term, doc_id div segWidth), so one term's postings split across
  * segments of at most `segWidth` candidate ids. That bounds the
  * collect_list state per group — a stopword's posting list at 100 TB
  * is billions of ids, which must never sit in ONE aggregation buffer;
  * segment-local lists parallelize the build and stream to parquet as
  * ordinary rows (readers merge segments, which arrive pre-sorted).
  *
  * Lists are emitted comma-joined: the portable-hash convention for
  * array results (the driver's pandas compare can't hash arrays), and
  * numeric-sorted so the text form is canonical.
  */
object InvertedIndex {

  /** Segmented postings over normalized words ([[TextDedup.normText]]).
    * Output: (tok, seg, df_seg, postings) — df_seg = docs in this
    * segment containing tok, postings = their sorted ids. */
  def postings(docs: DataFrame, segWidth: Long = 200L): DataFrame = {
    require(segWidth > 0, "segWidth must be positive")
    graft.Par.fanOut(docs)
      .select(col("doc_id"), TextDedup.normText(col("text")).as("norm"))
      .select(col("doc_id"), explode(expr("filter(split(norm, ' '), w -> w <> '')")).as("tok"))
      .dropDuplicates("doc_id", "tok")
      .withColumn("seg", expr(s"doc_id div ${segWidth}L"))
      .groupBy(col("tok"), col("seg"))
      .agg(count(lit(1)).as("df_seg"),
        concat_ws(",", sort_array(collect_list(col("doc_id")))).as("postings"))
  }
}
