package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C4-style segment-level deduplication: cut every document into
  * fixed-size non-overlapping token segments, drop every repeated
  * occurrence of a segment across the WHOLE corpus (the first
  * occurrence in (doc_id, position) order survives), and reassemble the
  * surviving segments into a cleaned document.
  *
  * This is the corpus-granularity between exact-document dedup
  * ([[TextDedup.exact]]) and near-dup pair detection: boilerplate that
  * repeats inside otherwise-distinct documents (headers, footers,
  * license blocks) is removed where it stands. C4 applies the same rule
  * at line granularity; this corpus has no newlines, so the segment
  * boundary is a token count.
  *
  * Scale posture (100 TB): segmentation is map-only (tokenize + explode
  * a per-doc index range + slice — the [[Chunking]] shape). The
  * duplicate decision is ONE shuffle keyed on the md5 of the segment
  * text — fixed-width keys, balanced by construction; the min-position
  * window runs inside each tiny same-segment group. Reassembly is one
  * more shuffle keyed on doc_id. No all-pairs stage anywhere; state per
  * key is O(occurrences of that segment).
  */
object SegmentDedup {

  /** Dedup `docs` (doc_id, text) at `segTokens`-token segment
    * granularity. Output: (doc_id, n_segs, n_kept, clean_text), one row
    * per input document, clean_text = surviving segments joined in
    * original order.
    *
    * Keeper rule: lexicographic min over (doc_id, seg_id), evaluated as
    * two chained window minima over the same partitioning (one shuffle;
    * no composite-key magnitude assumption at any document length).
    * A document shorter than one segment (including the empty document)
    * is a single (possibly empty) segment, so no document vanishes. */
  def dedupSegments(docs: DataFrame, segTokens: Int = 16): DataFrame = {
    require(segTokens > 0, "segment size must be positive")
    val segs = graft.Par.fanOut(docs)
      .select(col("doc_id"), expr("filter(split(text, ' '), w -> w != '')").as("ws"))
      .select(col("doc_id"), col("ws"),
        explode(expr(
          s"sequence(0, greatest((size(ws) + ${segTokens - 1}) div $segTokens - 1, 0))"))
          .as("seg_id"))
      .select(col("doc_id"), col("seg_id").cast("long").as("seg_id"),
        concat_ws(" ",
          expr(s"slice(ws, seg_id * $segTokens + 1, $segTokens)")).as("seg_text"))
    val perSegment = Window.partitionBy(col("seg_hash"))
    val marked = segs
      .withColumn("seg_hash", md5(col("seg_text")))
      .withColumn("min_doc", min(col("doc_id")).over(perSegment))
      .withColumn("min_seg",
        min(when(col("doc_id") === col("min_doc"), col("seg_id"))).over(perSegment))
      .withColumn("keep",
        col("doc_id") === col("min_doc") && col("seg_id") === col("min_seg"))
    marked
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segs"),
        count(when(col("keep"), 1)).as("n_kept"),
        sort_array(collect_list(when(col("keep"),
          struct(col("seg_id"), col("seg_text"))))).as("kept"))
      .select(col("doc_id"), col("n_segs"), col("n_kept"),
        concat_ws(" ", expr("transform(kept, x -> x.seg_text)")).as("clean_text"))
  }
}
