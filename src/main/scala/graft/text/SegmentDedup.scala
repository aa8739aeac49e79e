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

  /** EXACT repeated-substring removal — the true form of what
    * [[TextDedup.dupGramCoverage]] only measures (Lee et al.,
    * arXiv:2107.06499 "ExactSubstr": delete every span of ≥ `minTokens`
    * tokens whose text occurs elsewhere in the corpus, keeping the
    * first occurrence). The suffix-array formulation is sequential; the
    * distributed equivalence used here: a span of length ≥ L repeats
    * iff every one of its L-token windows repeats, so deleting all
    * tokens covered by a NON-FIRST occurrence of any duplicated L-gram
    * deletes exactly the maximal repeated spans at L-token resolution
    * (the canonical first occurrence survives verbatim — same keeper
    * rule as [[dedupSegments]], lexicographic min over (doc_id, pos),
    * computed with no composite-key magnitude assumption).
    *
    * Output per doc: (doc_id, n_tokens, n_dup_tokens, clean_text) —
    * clean_text = surviving tokens in original order.
    *
    * Scale posture (100 TB): gram generation is map-only (tokenize +
    * explode positions + slice, the [[Chunking]] shape), carrying
    * 60-bit gram hashes, never gram text, into the ONE shuffle keyed
    * on gram hash (balanced fixed-width keys; per-key state =
    * occurrences of that gram). Keeper resolution is a bounded
    * two-level aggregate; coverage union happens per document with
    * higher-order functions over position arrays bounded by document
    * length (documents are bounded; the corpus is not). No suffix
    * array, no global sort, no all-pairs. */
  def scrubExactSubstr(docs: DataFrame, minTokens: Int = 8): DataFrame = {
    require(minTokens > 0, "minTokens must be positive")
    val L = minTokens
    val toks = graft.Par.fanOut(docs)
      .select(col("doc_id"), expr("filter(split(text, ' '), w -> w != '')").as("ws"))
    // one row per L-gram position (1-based); docs shorter than L emit none
    val grams = toks
      .where(size(col("ws")) >= L)
      .select(col("doc_id"),
        explode(expr(s"sequence(1, size(ws) - ${L - 1})")).as("pos"),
        col("ws"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        graft.functions.PortableHash.h60(
          concat_ws(" ", expr(s"slice(ws, pos, $L)"))).as("h"))
    // first occurrence per gram: min doc, then min pos within that doc
    // (two chained aggs — no doc_id*K+pos composite, any doc length)
    val kDoc = grams.groupBy(col("h")).agg(min(col("doc_id")).as("kd"))
    val keeper = grams.join(kDoc, Seq("h"))
      .where(col("doc_id") === col("kd"))
      .groupBy(col("h"), col("kd")).agg(min(col("pos")).as("kp"))
    // every non-first occurrence covers [pos, pos+L-1] in its doc
    val dupPos = grams.join(keeper, Seq("h"))
      .where(!(col("doc_id") === col("kd") && col("pos") === col("kp")))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("pos"))).as("ps"))
    toks
      .join(dupPos, Seq("doc_id"), "left")
      .select(col("doc_id"), col("ws"),
        coalesce(col("ps"), expr("CAST(array() AS ARRAY<BIGINT>)")).as("ps"))
      .select(col("doc_id"), col("ws"),
        expr(s"array_distinct(flatten(transform(ps, p -> sequence(p, p + ${L - 1}))))")
          .as("cov"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens"),
        size(col("cov")).cast("long").as("n_dup_tokens"),
        concat_ws(" ", expr(
          // sequence(1, 0) DESCENDS in Spark, so the empty doc needs
          // its own branch (DuckDB's generate_series(1, 0) is empty)
          """CASE WHEN size(ws) = 0 THEN CAST(array() AS ARRAY<STRING>) ELSE
            |transform(
            |  filter(sequence(1, size(ws)), i -> NOT array_contains(cov, CAST(i AS BIGINT))),
            |  i -> element_at(ws, i)) END""".stripMargin)).as("clean_text"))
  }
}
