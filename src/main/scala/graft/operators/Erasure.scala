package graft.operators

import graft.Graft.LeaseOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten erasure — the compliance delete every data
  * platform must implement: remove every row keyed to a victim id
  * across the warehouse, and AUDIT the result (counts per table plus a
  * post-delete leak check computed from the erased output, never
  * assumed).
  *
  * Scale posture: erasure is one key-hashed left-anti join per table —
  * victim sets are tiny relative to the corpus (broadcast side), so
  * the delete costs one scan per table; the audit's four counts per
  * table are 1-row aggregates crossJoined (all broadcast). At 100 TB
  * the erased tables land via [[graft.sources.Ingest.overwriteSwap]]
  * exactly like an SCD rewrite.
  */
object Erasure {

  /** Remove every row of `df` whose `keyCol` appears in `victims`
    * (a single-column `key` frame). */
  def erase(df: DataFrame, keyCol: String, victims: DataFrame): DataFrame =
    df.join(
      victims.select(col("key")).dropDuplicates("key").withColumnRenamed("key", keyCol),
      Seq(keyCol), "left_anti")
      // a USING-join fronts the key column; restore the input order so
      // chained erases ([[eraseAny]]) keep the table's shape
      .select(df.columns.map(col): _*)

  /** Remove every row of `df` where ANY of `keyCols` hits the victim
    * set — the edge/pair-table form (a near-dup pair dies if EITHER
    * endpoint is erased). */
  def eraseAny(df: DataFrame, keyCols: Seq[String], victims: DataFrame): DataFrame =
    keyCols.foldLeft(df)((d, k) => erase(d, k, victims))

  /** Repair a DISTINCT derived index after erasing its base
    * occurrences: a key survives iff at least one surviving occurrence
    * still carries it (a gram hash leaves the index only when its
    * EVERY occurrence belonged to victims — hashes shared with
    * survivors must stay, or the scrub would under-delete). One
    * semi-join of the index against the erased base. */
  def repairDistinctIndex(index: DataFrame, keyCol: String,
                          erasedBase: DataFrame): DataFrame =
    index.join(erasedBase.select(col(keyCol)).dropDuplicates(keyCol),
      Seq(keyCol), "left_semi")

  /** Victim-scoped [[repairDistinctIndex]] — the per-batch form for a
    * CONTINUOUS deletion stream: only keys the victims carried can
    * possibly leave the index (every other key's carrier set is
    * untouched by the erase), so instead of re-deriving the surviving
    * key set from the whole erased base (a corpus-gram-sized
    * dedup shuffle on EVERY deletion micro-batch), probe the base for
    * the victim-carried keys alone and anti-join the orphans — keys
    * with no surviving carrier — out of the index.
    *
    * `victimCarried` must be the distinct keys the victims carried in
    * the SAME slice the index is defined over, captured from the base
    * BEFORE it was erased (after, the evidence is gone). Broadcast is
    * safe by construction: its size is bounded by the deletion batch
    * (victims × keys/doc), never by the corpus. Shuffle mass drops
    * from O(corpus distinct keys) to O(victim keys); the one base
    * scan is map-side filtered through the broadcast.
    *
    * Equivalent to [[repairDistinctIndex]] whenever every index key
    * has ≥1 base carrier — true by construction for a derived distinct
    * index, and pinned by the StreamErasureSpec equality suite
    * (streamed ≡ one-shot ≡ cold rebuild). */
  def repairDistinctIndexVictimScoped(index: DataFrame, keyCol: String,
                                      erasedBase: DataFrame,
                                      victimCarried: DataFrame): DataFrame = {
    // leased: the victim-key sub-plan is typically an O(corpus) base
    // scan (StreamErasure derives it from gram_occurrences) and the
    // repair plan evaluates it twice — the broadcast(vk) build inside
    // `still` and the probe side of `orphaned`. Without the persist
    // each deletion batch pays the base scan 2×; with it the batch
    // really pays the ONE map-side-filtered scan the design claims.
    val vk = graft.Graft.lease(victimCarried.select(col(keyCol)))
    val still = erasedBase
      .join(broadcast(vk), Seq(keyCol), "left_semi")
      .select(col(keyCol)).dropDuplicates(keyCol)
    val orphaned = vk.join(still, Seq(keyCol), "left_anti")
    index.join(broadcast(orphaned), Seq(keyCol), "left_anti")
  }

  /** Repair a min-label cluster assignment after erasure: victim
    * member rows are removed, and any cluster whose LABEL was a victim
    * (the min-id member) is relabeled to its minimum surviving member
    * — derived state must never keep pointing at an erased id. Output:
    * (doc_id, cluster_id) over the survivors. */
  def relabelClusters(clusters: DataFrame, victims: DataFrame): DataFrame = {
    val surv = erase(clusters, "doc_id", victims)
    val newLabel = surv.groupBy(col("cluster_id"))
      .agg(min(col("doc_id")).as("__nl"))
    surv.join(newLabel, Seq("cluster_id"))
      .select(col("doc_id"), col("__nl").as("cluster_id"))
  }

  /** [[audit]]'s row for an ANY-key table (pair/edge lists): n_deleted
    * counts rows where any of `keyCols` hits the victim set; n_leaked
    * re-probes the erased output the same way. */
  def auditAny(name: String, df: DataFrame, keyCols: Seq[String],
               victims: DataFrame): DataFrame = {
    val v = victims.select(col("key")).dropDuplicates("key")
    // both passes fold into ONE aggregation over a pass-tagged union
    // (same shape as [[audit]], r15): the pre-r15 form ran two 1-row
    // aggregate jobs plus a crossJoin broadcast build — pure job-count
    // overhead at any scale, since the counts are the same union scan
    def mark(d: DataFrame, pass: Int) = {
      val marked = keyCols.zipWithIndex.foldLeft(d) { case (acc, (k, i)) =>
        acc.join(broadcast(v.select(col("key").as(s"__vk$i"))),
          acc(k) === col(s"__vk$i"), "left")
      }
      val hit = keyCols.indices.map(i => col(s"__vk$i").isNotNull).reduce(_ || _)
      marked.select(lit(pass).as("__pass"), when(hit, lit(1)).as("__v"))
    }
    mark(df, 0).unionByName(mark(eraseAny(df, keyCols, v), 1))
      .agg(count(when(col("__pass") === 0, 1)).as("n_before"),
        count(when(col("__pass") === 0, col("__v"))).as("n_deleted"),
        count(when(col("__pass") === 1, 1)).as("n_after"),
        count(when(col("__pass") === 1, col("__v"))).as("n_leaked"))
      .select(lit(name).as("table_name"), col("n_before"), col("n_deleted"),
        col("n_after"), col("n_leaked"))
  }

  /** One audit row per (name, table, keyCol): n_before, n_deleted,
    * n_after, n_leaked — the leak count comes from re-probing the
    * ERASED output against the victim set, so a broken erase shows up
    * as n_leaked > 0 rather than being defined away.
    *
    * Each table is scanned exactly TWICE: one broadcast-marker pass over
    * the original (count(*) = n_before, count(marker) = n_deleted) and
    * one over the erased output (n_after, n_leaked — measured, not
    * derived). The r6 shape was four 1-row aggregates per table
    * crossJoined; re-probing the same table once per count made the
    * audit's cost depend on session cache state (the BENCH_r06 q79
    * steady run measured 4× its cold run re-paying those scans).
    *
    * The deduped victim set stays persisted for the session — it is
    * probed 2× per table, is tiny relative to the corpus (the broadcast
    * side), and like Curation's intermediates it stays cached until the
    * caller drops it (`spark.catalog.clearCache()` between runs, which
    * is what Bench and Verify do; a production deployment materializes
    * the victim list to parquet beside the erasure manifest anyway). */
  def audit(tables: Seq[(String, DataFrame, String)], victims: DataFrame): DataFrame = {
    require(tables.nonEmpty, "audit needs at least one table")
    val spark = victims.sparkSession
    val v = victims.select(col("key")).dropDuplicates("key").leased
    // ALL per-table 1-row aggregates fold into ONE pass-tagged union
    // and ONE groupBy(table_name) aggregation (r15): the pre-r15 shape
    // ran 2 single-row aggregate jobs + 1 crossJoin broadcast build PER
    // TABLE (a 6-table audit = ~18 serial AQE jobs of driver latency
    // for table-name-cardinality output). The measured semantics are
    // unchanged: pass 0 scans the original (n_before/n_deleted), pass 1
    // re-probes the ACTUAL erased output (n_after/n_leaked — still
    // measured, never derived). The 1-row seed per table keeps a fully
    // empty table's audit row present (count() over an empty group
    // would otherwise drop it), contributing to no count: its pass -1
    // matches neither condition.
    val seeds = tables.map { case (name, _, _) =>
      spark.range(1).select(lit(name).as("table_name"),
        lit(-1).as("__pass"), lit(null).cast("int").as("__v"))
    }
    val marked = tables.flatMap { case (name, df, keyCol) =>
      val vk = broadcast(v.withColumnRenamed("key", keyCol).withColumn("__v", lit(1)))
      def tag(d: DataFrame, pass: Int) =
        d.join(vk, Seq(keyCol), "left_outer")
          .select(lit(name).as("table_name"), lit(pass).as("__pass"), col("__v"))
      Seq(tag(df, 0), tag(erase(df, keyCol, v), 1))
    } ++ seeds
    marked.reduce(_ unionByName _)
      .groupBy(col("table_name"))
      .agg(count(when(col("__pass") === 0, 1)).as("n_before"),
        count(when(col("__pass") === 0, col("__v"))).as("n_deleted"),
        count(when(col("__pass") === 1, 1)).as("n_after"),
        count(when(col("__pass") === 1, col("__v"))).as("n_leaked"))
      .select(col("table_name"), col("n_before"), col("n_deleted"),
        col("n_after"), col("n_leaked"))
  }
}
