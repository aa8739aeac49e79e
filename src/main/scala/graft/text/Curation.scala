package graft.text

import graft.Graft.LeaseOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The canonical LLM training-data curation pipeline, composed from the
  * verified operators: exact/normalized dedup keepers → MinHash+LSH
  * near-duplicate removal (drop the higher doc id of each verified
  * pair — deterministic greedy) → quality floor → language filter.
  *
  * Each stage is one of the oracle-gated operators; the composition is
  * itself oracle-gated (q28), because at 100 TB this chain IS the
  * workload — a curation run that silently disagrees with its spec on
  * 0.1% of documents poisons a dataset.
  *
  * Scale: dedup/near-dup stages are banded (never all-pairs), the
  * quality/language stages are pure map work, and the joins against the
  * (small) loser/keeper id sets are semi/anti joins on doc_id.
  */
object Curation {

  /** Surviving documents with their quality scores.
    * docs columns: doc_id, text.
    *
    * Memory lifecycle: the pipeline persists two intermediates (the
    * shared shingle projection here, the narrow band table inside the
    * near-dup stage). They stay cached until the caller drops them —
    * `spark.catalog.clearCache()` between pipeline runs (what Bench and
    * Verify do), or `unpersist()` on a dedicated session. A production
    * deployment materializes both to parquet instead (the plan shape is
    * identical), which is also the only option at 100 TB. */
  def curate(docs: DataFrame,
             jaccardThreshold: Double = 0.5,
             minQuality: Double = 0.5,
             lang: String = "en"): DataFrame = {
    // One persisted shingle projection feeds both shingle consumers of
    // the near-dup stage (signatures AND jaccard verification) — without
    // it the composed pipeline re-derived shingles+md5 per sub-pipeline
    // and cost ~2.5× the sum of its stages (round-2 verdict). The
    // normalized-dedup / quality / language stages are cheap map scans
    // of the raw docs and share the parquet scan via codegen fusion.
    val sh = TextDedup.shingled(docs).leased
    val keepers = TextDedup.normalized(docs).select(col("doc_id"))
    val nearDupLosers = TextDedup.minhashLshPairsFromShingles(sh, jaccardThreshold)
      .select(col("doc_b").as("doc_id")).distinct()
    val quality = TextAnalysis.stats(docs).select(col("doc_id"), col("quality_score"))
    val langs = TextAnalysis.langGuess(docs).select(col("doc_id"), col("lang_guess"))
    docs.select(col("doc_id"))
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .join(quality, Seq("doc_id"))
      .join(langs, Seq("doc_id"))
      .where(col("quality_score") >= lit(minQuality) && col("lang_guess") === lit(lang))
      .select(col("doc_id"), col("quality_score"))
      .orderBy("doc_id")
  }

  /** Per-stage YIELD REPORT for the same pipeline — the one-row summary
    * every curation run ships with its dataset: how many documents
    * survive each successive stage (raw → exact/normalized dedup →
    * near-dup removal → quality floor → language filter). Computed as
    * ONE pass: per-doc survival flags from the stage operators, then a
    * single conditional aggregate — no per-stage rescans, so the report
    * costs one extra aggregate over the flags, not five pipeline runs. */
  def funnel(docs: DataFrame,
             jaccardThreshold: Double = 0.5,
             minQuality: Double = 0.5,
             lang: String = "en"): DataFrame = {
    val sh = TextDedup.shingled(docs).leased
    val keepers = TextDedup.normalized(docs).select(col("doc_id")).withColumn("kf", lit(1))
    val losers = TextDedup.minhashLshPairsFromShingles(sh, jaccardThreshold)
      .select(col("doc_b").as("doc_id")).distinct().withColumn("lzf", lit(1))
    val quality = TextAnalysis.stats(docs).select(col("doc_id"), col("quality_score"))
    val langs = TextAnalysis.langGuess(docs).select(col("doc_id"), col("lang_guess"))
    docs.select(col("doc_id"))
      .join(keepers, Seq("doc_id"), "left")
      .join(losers, Seq("doc_id"), "left")
      .join(quality, Seq("doc_id"))
      .join(langs, Seq("doc_id"))
      .select(
        coalesce(col("kf"), lit(0)).as("kf"),
        (lit(1) - coalesce(col("lzf"), lit(0))).as("nlf"),
        coalesce((col("quality_score") >= lit(minQuality)).cast("int"), lit(0)).as("qf"),
        coalesce((col("lang_guess") === lit(lang)).cast("int"), lit(0)).as("lf"))
      .agg(
        count(lit(1)).as("n_raw"),
        sum(col("kf")).as("n_after_dedup"),
        sum(col("kf") * col("nlf")).as("n_after_neardup"),
        sum(col("kf") * col("nlf") * col("qf")).as("n_after_quality"),
        sum(col("kf") * col("nlf") * col("qf") * col("lf")).as("n_after_lang"))
  }

  /** Per-source quota cap — the curation staple that stops one crawl
    * domain from dominating the training mix: keep only the `quota`
    * highest-quality documents of each source (quality DESC, doc_id
    * ties). The complement of [[graft.SparkEntry]] q83's rate-based
    * mixing: quotas cap hard, rates thin proportionally.
    *
    * `docs` columns: doc_id, text, source. Output: (source, rank,
    * doc_id, quality_score), rank 1..quota per source.
    *
    * Scale: selection is the bounded `top_k_pairs` aggregate — quota
    * rows of state per source with map-side partials, never a
    * per-source sort window (a hot domain at 100 TB has billions of
    * docs; a rank window would sort all of them inside the shuffle).
    * Docs with NULL quality (empty text) are ineligible by definition.
    * The quality join is doc_id-keyed; in production the score is a
    * scan-projection column of the curated table, same plan minus the
    * join. */
  def sourceQuota(docs: DataFrame, quota: Int = 10): DataFrame = {
    require(quota > 0)
    val q = TextAnalysis.stats(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("quality_score"))
      .where(col("quality_score").isNotNull)
    docs.select(col("doc_id"), col("source")).join(q, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(expr(s"top_k_pairs(doc_id, quality_score, $quota)").as("tk"))
      .select(col("source"), posexplode(col("tk")).as(Seq("r0", "p")))
      .select(col("source"), (col("r0") + 1).as("rank"),
        col("p.id").as("doc_id"), col("p.score").as("quality_score"))
      .orderBy("source", "rank")
  }

  /** Per-group exact top-fraction thresholds: for each `group`, the
    * smallest `score` value such that the rows scoring ≥ it are the
    * group's top `num/den` fraction (at least one row; ties at the
    * boundary are INCLUDED — keeping a doc never depends on tie order).
    * Output: (group, n_rows, threshold).
    *
    * Scale shape: the cumulative window runs over the per-group
    * DISTINCT-VALUE table (group-then-window) — value-compressed rows,
    * never the raw corpus; the group-partitioned sort is bounded by
    * score cardinality, not document count. Since values are distinct
    * within a partition, RANGE/ROWS framing peers are identical, so
    * any SQL engine replays it exactly. */
  def topFractionThresholds(scored: DataFrame, group: String, score: String,
                            num: Int = 1, den: Int = 4): DataFrame = {
    require(num > 0 && den >= num, s"top fraction must be in (0,1]: $num/$den")
    import org.apache.spark.sql.expressions.Window
    val n = scored.groupBy(col(group)).agg(count(lit(1)).as("n_rows"))
    val dist = scored.groupBy(col(group), col(score)).agg(count(lit(1)).as("c"))
    val cum = dist.withColumn("cum", sum(col("c")).over(
      Window.partitionBy(col(group)).orderBy(col(score).desc)))
    cum.join(n, Seq(group))
      .where(col("cum") >= greatest(lit(1L), expr(s"(n_rows * $num) div $den")))
      .groupBy(col(group), col("n_rows"))
      .agg(max(col(score)).as("threshold"))
      .select(col(group), col("n_rows"), col("threshold"))
  }
}
