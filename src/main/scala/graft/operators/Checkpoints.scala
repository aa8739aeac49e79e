package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release accounting for iterative operators' `localCheckpoint` state.
  *
  * An eager `localCheckpoint(true)` truncates lineage by materializing
  * the round into a persisted RDD — but that RDD is NOT a catalog cache:
  * `spark.catalog.clearCache()` never drops it, so a 5-round PageRank
  * would leak six checkpoint RDDs per call (found by
  * PersistBalanceSpec's registry sweep). Two rules restore balance:
  *
  *  - [[roll]]: once round N+1 has materialized, round N's checkpoint
  *    is fully consumed — unpersist it immediately (peak footprint =
  *    two rounds, not the whole iteration history);
  *  - [[leaseFinal]]: the last round's RDD backs the returned
  *    DataFrame, so its release is the caller's — registered via
  *    [[graft.Graft.leaseAction]], dropped by `releaseLeases()`/the
  *    enclosing `leaseScope` like every other operator intermediate.
  *
  * Consume-then-release is load-bearing here: unlike a persist lease
  * (which silently recomputes), a released checkpoint CANNOT recompute
  * — its lineage is gone, so materializing the result after release
  * fails loudly. All graft entry points (Bench/Verify/BenchGuard)
  * already consume before their teardown.
  */
private[graft] object Checkpoints {

  private def rddOf(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.logical.collectFirst { case lr: LogicalRDD => lr.rdd }

  /** Eagerly checkpoint `df` as the next round; unpersist `prev`'s
    * checkpoint RDD (consumed by the materialization that just ran). */
  def roll(df: DataFrame, prev: Option[DataFrame]): DataFrame = {
    val out = df.localCheckpoint(true)
    prev.foreach(p => rddOf(p).foreach(_.unpersist(blocking = false)))
    out
  }

  /** Register the final round's checkpoint RDD for caller-side release. */
  def leaseFinal(df: DataFrame): DataFrame = {
    rddOf(df).foreach(r => graft.Graft.leaseAction(() => r.unpersist(blocking = false)))
    df
  }
}
