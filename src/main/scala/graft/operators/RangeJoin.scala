package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyless point-in-interval (range) join via BINNING — the missing
  * member of the non-equi join family next to [[AsOfJoin]] (which
  * handles the KEYED temporal case). Spark's only native plan for a
  * pure range predicate is BroadcastNestedLoopJoin, which dies when
  * neither side is broadcast-small; the binning rewrite turns the range
  * predicate into an equi join any shuffle strategy can execute:
  *
  *  - each interval [lo, hi] explodes to the bins it covers
  *    (floor(lo/w) .. floor(hi/w));
  *  - each point maps to its single bin floor(p/w);
  *  - equi-join on the bin, then the EXACT range predicate as residual.
  *
  * A point's bin is unique, so no pair can match twice — no dedup
  * stage. Cost: |points| + Σ span(interval)/w map rows, one hash
  * shuffle on the bin. `binWidth` trades interval fan-out against bin
  * skew: pick ~ the median interval span so each interval explodes to
  * O(1) bins while a bin holds only points within one span-length.
  * At 100 TB both sides partition by bin — no broadcast requirement,
  * no cartesian anywhere (the reference never needs this operator —
  * its one non-equi pattern is the keyed as-of,
  * process_orders_sqls.py:100-105 — but a training-data pipeline hits
  * it for IP→range, score-band, and length-bucket joins).
  */
object RangeJoin {
  /** Join `points` to every `intervals` row with lo ≤ point ≤ hi
    * (BETWEEN semantics, inclusive both ends). Column names must be
    * disjoint between the two inputs apart from the bin added here.
    * Both bound columns must be non-null; null points never match. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val bin = "__range_bin"
    val pb = points.withColumn(bin,
      floor(col(pointCol).cast("double") / lit(binWidth)).cast("long"))
    val ib = intervals.withColumn(bin,
      explode(sequence(
        floor(col(loCol).cast("double") / lit(binWidth)).cast("long"),
        floor(col(hiCol).cast("double") / lit(binWidth)).cast("long"))))
    pb.join(ib, Seq(bin))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(bin)
  }
}
