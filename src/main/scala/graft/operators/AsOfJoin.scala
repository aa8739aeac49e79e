package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join against an SCD2 dimension — the single
  * most reused idiom in the reference's analytic queries
  * (docs/cheat-sheets/postgresql.md:106,131,143): equi key + validity
  * band `t ∈ [start_time, end_time)`.
  *
  * Spark-first shape: Catalyst plans the equi key into a hash join and
  * keeps the band as a residual filter — with `broadcast` on the dim
  * (the default: SCD dims are entity-bounded, tiny next to facts even at
  * 100 TB) the fact side never shuffles. For a dim too large to
  * broadcast, pass `broadcastDim = false` and the same plan becomes a
  * key-partitioned shuffle join; the band stays residual either way, so
  * there is never a cartesian or a range-explosion.
  */
object AsOfJoin {

  /** Join each left row to the dim version valid at `leftTime`.
    *
    * @param left      fact side
    * @param dim       SCD2 dimension with start_time/end_time columns
    * @param leftKey   equi-join key column name on `left`
    * @param dimKey    equi-join key column name on `dim`
    * @param leftTime  per-row probe time (e.g. the event time), or a
    *                  literal for a "current state" read
    */
  def apply(left: DataFrame, dim: DataFrame, leftKey: String, dimKey: String,
            leftTime: Column, joinType: String = "inner",
            broadcastDim: Boolean = true): DataFrame = {
    val d = if (broadcastDim) broadcast(dim) else dim
    left.join(d,
      left(leftKey) === dim(dimKey) &&
        leftTime >= dim("start_time") && leftTime < dim("end_time"),
      joinType)
  }

  /** "Current state" read: the one version per key valid at `asOf`
    * (reference queries use CURRENT_TIMESTAMP; injected for
    * determinism). */
  def currentAt(dim: DataFrame, asOf: String): DataFrame = {
    val at = to_timestamp(lit(asOf))
    dim.where(at >= col("start_time") && at < col("end_time"))
  }
}
