package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval sweep-line: per-instant concurrency over a table of
  * inclusive intervals [start, end] — peak concurrent sessions, maximum
  * simultaneous connections, warehouse load curves. The classic
  * formulation (sort all boundaries, walk them adding ±1) is inherently
  * sequential; this is the distributed form:
  *
  *   1. boundaries collapse to one row per distinct instant
  *      (n_starts, n_ends) — map-side-combinable aggregate;
  *   2. the running ±1 walk is a [[PrefixSum.runningTotal]] over the
  *      instant key (two-level bucket scan — no single-partition
  *      window; buckets default to days of epoch-µs);
  *   3. inclusive semantics close-form: active(t) = starts≤t − ends<t
  *      = running(starts−ends at ≤t) + ends_at_t.
  *
  * Everything is exact integer arithmetic on epoch-µs, so results
  * hash-match a naive global-window oracle.
  */
object Sweep {

  /** Concurrency at every boundary instant of `intervals`. Columns
    * `startCol`/`endCol` must be timestamps with start ≤ end; intervals
    * are inclusive at both ends. Output: one row per distinct boundary
    * instant — (t: epoch-µs, n_starts, n_ends, running_total,
    * concurrent). Between consecutive output instants concurrency is
    * constant at `running_total` (= active just after this instant). */
  def concurrency(intervals: DataFrame, startCol: String, endCol: String,
                  bucketWidth: Long = 86400000000L): DataFrame = {
    val bounds = intervals
      .select(unix_micros(col(startCol)).as("t"),
        lit(1L).as("s"), lit(0L).as("e"))
      .union(intervals.select(unix_micros(col(endCol)).as("t"),
        lit(0L).as("s"), lit(1L).as("e")))
      .groupBy(col("t"))
      .agg(sum(col("s")).as("n_starts"), sum(col("e")).as("n_ends"))
      .withColumn("delta", col("n_starts") - col("n_ends"))
    PrefixSum.runningTotal(bounds, "t", "delta", bucketWidth)
      .withColumn("concurrent", col("running_total") + col("n_ends"))
      .drop("delta")
  }
}
