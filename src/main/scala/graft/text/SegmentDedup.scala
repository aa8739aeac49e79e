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
    * occurrences of that gram). Keeper resolution is one map-side
    * combinable struct-min aggregate and the dup-marking join is
    * hot-key salted (see [[dupOccurrences]]); coverage union happens
    * per document with
    * higher-order functions over position arrays bounded by document
    * length (documents are bounded; the corpus is not). No suffix
    * array, no global sort, no all-pairs. */
  def scrubExactSubstr(docs: DataFrame, minTokens: Int = 8): DataFrame =
    scrubExactSubstrFromGrams(docs, gramOccurrences(docs, minTokens), minTokens)

  /** The corpus gram-occurrence table (doc_id, pos, h) — the
    * distributed stand-in for the suffix array, and corpus state like
    * the dedup pair table: derived once per corpus (Warehouse
    * `gram_occurrences`), read by every substring analytic
    * (q122/q123/q124) instead of re-hashing the corpus per query.
    * Map-only: tokenize + explode positions + 60-bit md5 of the
    * L-token slice; hashes only, never gram text. */
  def gramOccurrences(docs: DataFrame, minTokens: Int = 8): DataFrame = {
    require(minTokens > 0, "minTokens must be positive")
    gramsOf(tokenized(docs), minTokens)
  }

  /** A gram repeated more often than this across the corpus is treated
    * as a HOT key (boilerplate-class) and salted in the dup-marking
    * join — see [[dupOccurrences]]. */
  val HotGramOccurrences = 1024L

  /** Non-first occurrences (doc_id, pos) of every duplicated gram —
    * the shared dup-marking core of the full and incremental scrubs.
    *
    * Keeper resolution is ONE aggregate: lexicographic min over
    * (doc_id, pos) via struct-min, so a corpus-wide boilerplate gram
    * combines MAP-SIDE (partial min + count per mapper) and the
    * shuffle carries one row per (gram, mapper) — no hot reducer, no
    * composite-key magnitude assumption at any document length.
    *
    * The occurrence×keeper join that marks non-first occurrences DOES
    * key on the raw hash — a mega-gram would land its every occurrence
    * on one reducer there. The keeper aggregate's occurrence count
    * (free — same shuffle) feeds a bounded hot-key audit, and
    * [[graft.operators.SkewJoin.saltedAudited]] spreads exactly the
    * audited keys over ceil(cnt/[[HotGramOccurrences]]) buckets (≤ 64,
    * ≤ 1024 keys — broadcast-sized at any corpus scale); cold keys pay
    * no replication. AQE's runtime skew split remains the second line
    * of defense for anything the audit's caps exclude. */
  def dupOccurrences(grams: DataFrame): DataFrame = {
    val keeperC = grams.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("k"), count(lit(1)).as("cnt"))
    val keeper = keeperC
      .select(col("h"), col("k.doc_id").as("kd"), col("k.pos").as("kp"))
    val hot = keeperC.where(col("cnt") > HotGramOccurrences)
      .orderBy(col("cnt").desc, col("h")).limit(1024)
      .select(col("h"),
        expr(s"CAST(least(64L, (cnt + ${HotGramOccurrences - 1}) div " +
          s"$HotGramOccurrences) AS INT)").as("__buckets"))
    graft.operators.SkewJoin
      .saltedAudited(grams, keeper, Seq("h"), precomputedHot = Some(hot))
      .where(!(col("doc_id") === col("kd") && col("pos") === col("kp")))
      .select(col("doc_id"), col("pos"))
  }

  /** [[scrubExactSubstr]] with the gram table supplied (the
    * materialized-artifact path — `grams` must be
    * [[gramOccurrences]](docs, minTokens)). */
  def scrubExactSubstrFromGrams(docs: DataFrame, grams: DataFrame,
                                minTokens: Int = 8): DataFrame = {
    require(minTokens > 0, "minTokens must be positive")
    // every non-first occurrence covers [pos, pos+L-1] in its doc
    assemble(tokenized(docs), dupOccurrences(grams), minTokens)
  }

  /** INCREMENTAL [[scrubExactSubstr]] — the ingestion shape: scrub a
    * NEW batch against the existing corpus without ever re-pairing
    * corpus×corpus (the [[TextDedup.minhashLshPairsBetween]] /
    * `annIvfNewAgainstCorpus` discipline applied to substring dedup).
    * A batch gram is duplicated if its hash exists ANYWHERE in the
    * corpus (the corpus is immutable, already-scrubbed state — every
    * corpus occurrence precedes the batch) or if it is a non-first
    * occurrence within the batch itself (same keeper rule as the full
    * scrub, restricted to batch grams).
    *
    * Scale: the corpus contributes only its DISTINCT gram-hash index —
    * at 100 TB that index is a materialized warehouse artifact (built
    * once, appended per batch; a bloom filter fronts it), and the
    * per-batch cost is batch grams × (one index probe + one in-batch
    * keeper agg) — independent of corpus size beyond the index probe. */
  def scrubExactSubstrAgainst(newDocs: DataFrame, corpus: DataFrame,
                              minTokens: Int = 8): DataFrame =
    scrubExactSubstrAgainstIndex(newDocs, gramIndex(corpus, minTokens), minTokens)

  /** The corpus side of the incremental scrub, reduced to what it
    * actually is: the DISTINCT 60-bit gram-hash set — the artifact a
    * production pipeline materializes once and appends per batch
    * (column `h`). */
  def gramIndex(corpus: DataFrame, minTokens: Int = 8): DataFrame =
    gramsOf(tokenized(corpus), minTokens).select(col("h")).distinct()

  /** [[scrubExactSubstrAgainst]] with the corpus pre-reduced to its
    * gram index — the form a maintained-index deployment (streaming
    * ingest, nightly batches) calls directly. `bloom` (a serialized
    * sketch over the index's `h` column — the warehouse artifact
    * [[graft.operators.BloomPrune.sketchBloomBytes]] builds beside the
    * index) fronts the probe: batch grams that CANNOT be in the index
    * are dropped map-side, before the semi-join shuffle. No false
    * negatives, so the scrub output is bit-identical with or without
    * the bloom — it only changes how many rows reach the shuffle. */
  def scrubExactSubstrAgainstIndex(newDocs: DataFrame, index: DataFrame,
                                   minTokens: Int = 8,
                                   bloom: Option[Array[Byte]] = None): DataFrame =
    scrubAgainstIndexFromGrams(newDocs, gramOccurrences(newDocs, minTokens),
      index, minTokens, bloom)

  /** [[scrubExactSubstrAgainstIndex]] with the batch's gram table also
    * supplied (both sides read from the materialized artifact). */
  def scrubAgainstIndexFromGrams(newDocs: DataFrame, grams: DataFrame,
                                 index: DataFrame, minTokens: Int = 8,
                                 bloom: Option[Array[Byte]] = None): DataFrame = {
    require(minTokens > 0, "minTokens must be positive")
    val L = minTokens
    val toks = tokenized(newDocs)
    // bloom pre-filter: map-side, zero-shuffle, one-sided — a gram in
    // the index ALWAYS passes, so the semi-join below sees every true
    // duplicate and the scrub result is unchanged
    val probe = bloom.fold(grams)(b =>
      grams.where(graft.operators.BloomPrune.mightContainLong(b, col("h"))))
    val inCorpus = probe.join(index.select(col("h")), Seq("h"), "left_semi")
    val dupPos = inCorpus.select(col("doc_id"), col("pos"))
      .unionByName(dupOccurrences(grams))
    assemble(toks, dupPos, L)
  }

  /** Batch GRAM-NOVELTY monitor — "how much new information does this
    * crawl actually bring?": per source, the arriving batch's ≥L-token
    * gram occurrences split into already-in-corpus vs novel, with the
    * novelty rate in integer ppm and the distinct-novel count (a batch
    * can be 90% novel by occurrence yet hammer one new template —
    * distinct-novel is what grows the index). The ingestion-side
    * counterpart of q82's corpus-level dup coverage: a collapsing
    * novelty rate across batches means the crawl re-reads what the
    * corpus already holds and the marginal data buys nothing.
    *
    * `bloom` (the gram_bloom artifact fronting the index) is used the
    * q123 way — one-sided, map-side: a bloom-NEGATIVE gram is novel
    * without touching the shuffle, a bloom-positive resolves against
    * the index left-join. No false negatives, so counts are exact with
    * or without it; it pays off exactly when novelty is high (the
    * probe shuffle carries only the maybe-known mass).
    *
    * Scale: batch-proportional — the corpus appears only as its
    * distinct-hash index (the maintained artifact); one fixed-width
    * hash join + one per-source aggregate with map-side combine. */
  def batchNovelty(batchGrams: DataFrame, docSources: DataFrame,
                   index: DataFrame,
                   bloom: Option[Array[Byte]] = None): DataFrame = {
    val g = batchGrams.select(col("doc_id"), col("h"))
    val flagged = bloom.fold(g.withColumn("bf", lit(true)))(b =>
      g.withColumn("bf",
        graft.operators.BloomPrune.mightContainLong(b, col("h"))))
    val probed = flagged.where(col("bf"))
      .join(index.select(col("h")).withColumn("known", lit(1)), Seq("h"), "left")
      .select(col("doc_id"), col("h"), coalesce(col("known"), lit(0)).as("known"))
    val merged = probed.unionByName(
      flagged.where(!col("bf"))
        .select(col("doc_id"), col("h"), lit(0).as("known")))
    val per = merged.join(docSources, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_grams"),
        sum(lit(1L) - col("known")).as("n_novel"),
        countDistinct(when(col("known") === 0, col("h"))).as("n_distinct_novel"))
    docSources.select(col("source")).distinct()
      .join(per, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        expr("(coalesce(n_novel, 0L) * 1000000) div greatest(1L, coalesce(n_grams, 0L))")
          .as("novelty_ppm"),
        coalesce(col("n_distinct_novel"), lit(0L)).as("n_distinct_novel"))
      .orderBy("source")
  }

  /** Source-level exact-substring overlap matrix — which sources share
    * verbatim ≥L-token spans (template/boilerplate flow between
    * sources; the exact-substring companion to the near-dup matrix
    * q116 builds from MinHash pairs). One row per unordered source
    * pair that shares at least one gram: shared distinct gram-hash
    * count, each side's distinct gram count, and shared/min-side in
    * integer ppm (a containment-style score).
    *
    * Scale: the per-gram self-join fans out by sources-per-gram² —
    * bounded by the SOURCE dimension (a small dim by construction),
    * not the corpus; a corpus-wide boilerplate gram costs |sources|²
    * rows, once. The (h, source) stream is distinct-reduced before the
    * join (map-side combine on fixed-width keys). */
  def sourceGramOverlap(docs: DataFrame, minTokens: Int = 8): DataFrame =
    sourceGramOverlapFromGrams(
      gramOccurrences(docs.select(col("doc_id"), col("text")), minTokens),
      docs.select(col("doc_id"), col("source")))

  /** [[sourceGramOverlap]] over a supplied gram table + doc→source
    * dim (the materialized-artifact path). */
  def sourceGramOverlapFromGrams(grams: DataFrame, docSource: DataFrame): DataFrame = {
    val gs = grams
      .join(docSource.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("h"), col("source")).distinct()
    val tot = gs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val a = gs.select(col("h"), col("source").as("src_x"))
    val b = gs.select(col("h"), col("source").as("src_y"))
    a.join(b, Seq("h")).where(col("src_x") < col("src_y"))
      .groupBy(col("src_x"), col("src_y"))
      .agg(count(lit(1)).as("n_shared"))
      .join(tot.select(col("source").as("src_x"), col("n").as("grams_x")), Seq("src_x"))
      .join(tot.select(col("source").as("src_y"), col("n").as("grams_y")), Seq("src_y"))
      .select(col("src_x"), col("src_y"), col("n_shared"),
        col("grams_x"), col("grams_y"),
        expr("(n_shared * 1000000L) div least(grams_x, grams_y)").as("share_ppm"))
  }

  /** (doc_id, ws) token arrays — the shared scrub input shape. */
  private def tokenized(docs: DataFrame): DataFrame =
    graft.Par.fanOut(docs)
      .select(col("doc_id"), expr("filter(split(text, ' '), w -> w != '')").as("ws"))

  /** One row per L-gram position (1-based, 60-bit hash; docs shorter
    * than L emit none) — map-only, hashes only into the shuffle. */
  private def gramsOf(toks: DataFrame, L: Int): DataFrame =
    toks
      .where(size(col("ws")) >= L)
      .select(col("doc_id"),
        explode(expr(s"sequence(1, size(ws) - ${L - 1})")).as("pos"),
        col("ws"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        graft.functions.PortableHash.h60(
          concat_ws(" ", expr(s"slice(ws, pos, $L)"))).as("h"))

  /** Coverage union + reassembly: duplicate occurrences (doc_id, pos)
    * → per-doc covered-position set → surviving tokens in order. */
  private def assemble(toks: DataFrame, dupOccurrences: DataFrame, L: Int): DataFrame = {
    val dupPos = dupOccurrences
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
