package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable equi-width histogram quantile sketch — the 100 TB companion
  * to exact rank-selection quantiles (q43): where the exact operator
  * must sort every value inside each group, the sketch reduces the data
  * to (group, bin, count) cells in ONE map-side-combinable aggregation,
  * and cells merge by addition (per-day / per-partition histograms union
  * for free — the same mergeability contract as the KMV (q51) and
  * Count-Min (q55) sketches).
  *
  * The estimate for quantile q is the LOWER EDGE of the first bin whose
  * cumulative count reaches ⌈q·n⌉ — all-integer arithmetic (cum·den ≥
  * n·num avoids the ceiling entirely), so estimates are deterministic
  * and engine-reproducible. The exact quantile provably lies in
  * [estimate, estimate + binWidth): resolution is the only approximation.
  *
  * Scale posture: the shuffle carries at most (groups × value-range /
  * binWidth) cells regardless of row count; the cumulative window runs
  * over bin-cardinality rows (tiny forever), never over the data.
  */
object HistQuantile {

  /** The sketch itself: one (group, bin, cnt) cell per non-empty bin,
    * bin = value − value mod binWidth (integer lower edge). */
  def sketch(df: DataFrame, group: String, value: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    df.groupBy(col(group),
        (col(value) - pmod(col(value), lit(binWidth))).as("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from a fresh sketch over `df`. `qs` lists
    * (output column, numerator, denominator) — e.g. ("p90_bin", 9, 10).
    * Output: (group, n_rows, <one column per q>). */
  def estimates(df: DataFrame, group: String, value: String, binWidth: Long,
                qs: Seq[(String, Int, Int)]): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    val cumW = Window.partitionBy(col(group)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = sketch(df, group, value, binWidth)
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col(group))))
    val aggs = max(col("n")).as("n_rows") +:
      qs.map { case (name, num, den) =>
        // cum ≥ ⌈(num/den)·n⌉  ⇔  cum·den ≥ n·num (cum is an integer)
        min(when(col("cum") * den >= col("n") * num, col("bin"))).as(name)
      }
    c.groupBy(col(group)).agg(aggs.head, aggs.tail: _*)
  }
}
