package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running total (prefix sum) over a global key order — the
  * primitive behind sequence packing (assign documents to fixed
  * token-budget packs by cumulative offset), cumulative corpus curves,
  * and deterministic output sharding.
  *
  * A naive `sum(...).over(Window.orderBy(key))` is a single-partition
  * window — one task scans the whole corpus, the classic 100 TB
  * scale-killer. This is the standard two-level scan instead:
  *   1. coarsen the key into order-respecting buckets (`key div width`);
  *   2. per-bucket partial sums (map-side combine → #buckets tiny rows);
  *   3. exclusive prefix-sum of the bucket sums — a window over
  *      #buckets rows, trivially small;
  *   4. broadcast the bucket offsets back; within each bucket a
  *      partitioned (parallel) window adds the local running sum.
  * Every big-data stage is parallel; only the #buckets-row table is
  * processed serially.
  *
  * Bucketing assumes a numeric, reasonably dense key (doc ids,
  * timestamps): pick `bucketWidth` so one bucket ≈ one task. For
  * arbitrary ordering keys, substitute stage 1 with
  * `repartitionByRange` + `spark_partition_id()` — ranges are ordered,
  * so the same three downstream stages apply unchanged.
  */
object PrefixSum {

  /** Adds `running_total` = sum of `valCol` over all rows with key ≤
    * this row's key. `keyCol` must be unique and non-negative; ties are
    * impossible by uniqueness, so the result is total-order exact. */
  def runningTotal(df: DataFrame, keyCol: String, valCol: String,
                   bucketWidth: Long = 1024L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val bucketed = df.withColumn("__bucket", expr(s"$keyCol div $bucketWidth"))
    val bucketSums = bucketed.groupBy(col("__bucket"))
      .agg(sum(col(valCol)).as("__bsum"))
    // exclusive scan over the tiny bucket table (rows = keyspan/width)
    val offsets = bucketSums
      .withColumn("__offset",
        coalesce(sum(col("__bsum")).over(
          Window.orderBy(col("__bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bucket"), col("__offset"))
    val inBucket = Window.partitionBy(col("__bucket")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("running_total", col("__offset") + sum(col(valCol)).over(inBucket))
      .drop("__bucket", "__offset")
  }

  /** Sequence packing: assign each row to a fixed-budget pack by its
    * cumulative offset in `keyCol` order — the scalable contiguous
    * variant of greedy first-fit (a row may straddle two budgets; the
    * pack id is taken at its starting offset). Adds `running_total`
    * and `pack_id`. */
  def packByBudget(df: DataFrame, keyCol: String, valCol: String,
                   budget: Long, bucketWidth: Long = 1024L): DataFrame = {
    require(budget > 0, "budget must be positive")
    runningTotal(df, keyCol, valCol, bucketWidth)
      .withColumn("pack_id", expr(s"(running_total - $valCol) div $budget"))
  }
}
