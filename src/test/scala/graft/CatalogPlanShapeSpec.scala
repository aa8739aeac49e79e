package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Plan-shape evidence for the CATALOG's scale-class claims — the drift
  * gate the r12 verdict asked for after two hand-assigned classes were
  * caught overstating the enforced posture (q24 labeled
  * bounded-candidates while its label block grew with the corpus; q76
  * labeled fixed-batch-incremental while it re-banded the corpus per
  * call). A class is a CLAIM ABOUT THE PLAN, so the spec checks the
  * plan:
  *
  *  - '''fixed-batch-incremental''' ⇒ the corpus side reads a
  *    MAINTAINED WAREHOUSE ARTIFACT — the query's optimized plan must
  *    scan the named artifact directory (a plan whose only inputs are
  *    raw corpus tables is re-deriving history per batch, contradicting
  *    the class).
  *  - '''bounded-candidates''' ⇒ the bounding construct must appear in
  *    the plan: the LSH occupancy-cap filter (`<= 256`), a cell/chunk/
  *    bin blocking column, a bounded top-k aggregate, or blocking via a
  *    landed artifact (the cap is then enforced at artifact build).
  *
  * TOTALITY is the teeth: every query in those two classes must carry
  * either evidence or an explicit exemption with its reason — a new
  * query cannot claim the class without the plan backing it up. */
class CatalogPlanShapeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** query → warehouse artifact directory its plan must scan. */
  private val artifactScan: Map[String, String] = Map(
    // fixed-batch-incremental: maintained corpus state, probed per batch
    "q76_incremental_neardup" -> "band_signatures_base",
    "q77_ann_incremental" -> "ivf_assign",
    "q123_substr_scrub_incr" -> "gram_index_base",
    "q131_dedup_burndown" -> "neardup_pairs",
    "q137_margin_mining_incr" -> "margin_denoms",
    "q143_index_drift" -> "ivf_assign",
    "q153_dsir_incremental" -> "dsir_counts",
    "q156_embedding_drift" -> "label_centroid_sums_base",
    "q157_quality_drift" -> "doc_quality",
    "q158_batch_novelty" -> "gram_index_base",
    // bounded-candidates whose bound is the landed blocking artifact
    "q24_embedding_neardup" -> "ivf_assign",
    "q29_ann_ivf_trained" -> "ann_ivf_topk", // reads the landed top-k list itself
    "q44_ann_ivfpq" -> "pq_codes",
    "q111_jl_distortion" -> "ivf_assign",
    "q116_source_overlap" -> "neardup_pairs",
    "q125_margin_mining" -> "ivf_assign",
    // r16: the demo reads the CAPPED band table (the ≤256 bucket bound
    // now lives in the artifact build, exactly like the other landed
    // index state) and the leakage audit reads the pair table the graph
    // analytics already consume
    "q14_dedup_minhash_lsh" -> "band_signatures",
    "q70_split_leakage" -> "neardup_pairs")

  /** query → substring that must appear in the optimized plan (the
    * in-plan bounding construct). */
  private val planEvidence: Map[String, String] = Map(
    "q109_minhash_calibration" -> "<= 256",
    "q16_simhash_neardup" -> "chunk_val",  // hamming chunk blocking
    "q68_payload_neardup" -> "chunk_val",
    "q25_ann_ivf" -> "cell",               // IVF cell blocking (literal codebook)
    "q81_semantic_dedup" -> "cell",
    "q33_range_join_price_bands" -> "__range_bin", // bin-blocked range join
    "q96_fuzzy_match" -> "blk",            // key-blocked fuzzy candidates
    "q32_ngram_jaccard" -> "sorted_intersect_count",  // prefix-filter verify
    "q40_contamination" -> "sorted_intersect_count",
    "q85_label_outliers" -> "top_k_pairs") // bounded aggregate state

  /** query → why no plan assertion is feasible (reviewed reasons, not
    * waivers). */
  private val exempt: Map[String, String] = Map(
    "q63_incremental_rollup" -> ("the maintained state IS the per-day aggregate " +
      "states (no corpus artifact to probe); fold ≡ recompute pinned by " +
      "IncrementalAggSpec"))

  private def coveredClasses = Set("bounded-candidates", "fixed-batch-incremental")

  test("every bounded-candidates / fixed-batch-incremental query carries plan evidence") {
    val claimed = Catalog.ScaleClass.collect {
      case (q, c) if coveredClasses(c) => q
    }.toSet
    val covered = artifactScan.keySet ++ planEvidence.keySet ++ exempt.keySet
    val missing = claimed -- covered
    val stale = covered -- claimed
    assert(missing.isEmpty,
      s"class claims without plan evidence (add to artifactScan/planEvidence " +
        s"or exempt WITH a reason): ${missing.toSeq.sorted.mkString(", ")}")
    assert(stale.isEmpty,
      s"evidence entries for queries no longer in a covered class: " +
        s"${stale.toSeq.sorted.mkString(", ")}")
  }

  // the ANALYZED plan, deliberately: cache substitution (operators lease
  // shared intermediates) replaces file scans with InMemoryRelation in
  // the optimized plan, hiding exactly the evidence this spec asserts
  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }
    }.flatten

  test("artifact-probing queries really scan the claimed warehouse artifact") {
    val bad = artifactScan.toSeq.sortBy(_._1).flatMap { case (q, artifact) =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      val paths = scanPaths(df)
      Graft.releaseLeases(); spark.catalog.clearCache()
      if (paths.exists(_.contains(s"/$artifact"))) None
      else Some(s"$q: plan scans ${paths.mkString(", ")} — no /$artifact")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("in-plan bounding constructs appear in the optimized plan") {
    val bad = planEvidence.toSeq.sortBy(_._1).flatMap { case (q, needle) =>
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.analyzed.toString
      Graft.releaseLeases(); spark.catalog.clearCache()
      if (plan.contains(needle)) None
      else Some(s"$q: optimized plan lacks '$needle'")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
