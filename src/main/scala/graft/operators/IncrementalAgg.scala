package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-rollup pattern:
  * instead of rescanning history every batch, each batch reduces to a
  * small PARTIAL STATE per key and states merge exactly. The state here
  * is (cnt, k-minimum-value hash set): counts add; the k smallest
  * distinct hashes of a union are the k smallest of the merged k
  * smallest — so both the count and the KMV distinct estimate of the
  * fold EQUAL a from-scratch recompute, bit for bit (q63's oracle is
  * the recompute).
  *
  * Merging is associative and commutative, so states combine in any
  * tree shape — per-day → per-week → total, or across partitions. The
  * hierarchical fold IS the 100 TB shape: a nightly batch touches one
  * day's data plus state the size of (keys × k hashes), never history.
  */
object IncrementalAgg {

  /** Partial state of one batch: (key, cnt, hs) where hs holds the at
    * most `k` smallest distinct 60-bit hashes of `hashCol`.
    *
    * `k_min` ([[graft.functions.KMinHashes]]) is the bounded
    * accumulator: its aggregation buffer never exceeds k longs, so a
    * distinct-heavy batch cannot blow the state the way
    * `slice(array_sort(collect_set(h)), 1, k)` would (that formulation
    * holds EVERY distinct value before slicing; KMinAggSpec pins the
    * two equal). Map-side partials obey the same cap, so shuffled
    * state is ≤ k longs per (key × partition). */
  def state(batch: DataFrame, key: String, hashCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    batch.groupBy(col(key)).agg(
      count(lit(1)).as("cnt"),
      expr(s"k_min($hashCol, $k)").as("hs"))
  }

  /** Per-batch states as ONE grouped aggregate — `batchCol` (e.g. the
    * day) rides in the grouping key, so N batches cost one shuffle and
    * a CONSTANT-SIZE plan instead of N per-batch subplans unioned
    * driver-side (the round-5 q63 shape, which grew linearly with the
    * calendar). */
  def stateByBatch(batch: DataFrame, key: String, batchCol: String,
                   hashCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    batch.groupBy(col(key), col(batchCol)).agg(
      count(lit(1)).as("cnt"),
      expr(s"k_min($hashCol, $k)").as("hs"))
  }

  /** Exact merge of MANY states in one aggregate (the companion of
    * [[stateByBatch]]): counts add; hash sets union, dedup, re-truncate.
    * The flatten is bounded by construction — each input hs carries at
    * most k longs. */
  def mergeStates(states: DataFrame, key: String, k: Int): DataFrame =
    states.groupBy(col(key)).agg(
      sum(col("cnt")).as("cnt"),
      expr(s"slice(array_sort(array_distinct(flatten(collect_list(hs)))), 1, $k)").as("hs"))

  /** Exact merge of two states: counts add; hash sets union, dedup,
    * and re-truncate to the k smallest. */
  def merge(a: DataFrame, b: DataFrame, key: String, k: Int): DataFrame =
    a.union(b).groupBy(col(key)).agg(
      sum(col("cnt")).as("cnt"),
      expr(s"slice(array_sort(array_distinct(flatten(collect_list(hs)))), 1, $k)").as("hs"))

  /** Balanced fold of many batch states (associativity makes any tree
    * exact; the balanced one keeps plan depth logarithmic). */
  def fold(states: Seq[DataFrame], key: String, k: Int): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    var level = states
    while (level.size > 1)
      level = level.grouped(2).map {
        case Seq(a, b) => merge(a, b, key, k)
        case Seq(a) => a
      }.toSeq
    level.head
  }

  /** KMV distinct estimate from the state (q51 arithmetic: (k−1)·2⁶⁰ /
    * h_k, exact distinct when the set never filled). */
  def estimate(state: DataFrame, k: Int): DataFrame =
    state.withColumn("kmv_estimate",
      when(size(col("hs")) >= k,
        lit((k - 1).toDouble) * pow(lit(2.0), lit(60.0))
          / element_at(col("hs"), k).cast("double"))
        .otherwise(size(col("hs")).cast("double")))
}
