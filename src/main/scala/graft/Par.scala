package graft

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-heavy per-row stages (signature
  * hashing, vector math, decode): when the upstream scan yields fewer
  * partitions than the session's default parallelism — e.g. a small
  * single-row-group parquet file — redistribute before the expensive
  * map. At 100 TB inputs arrive in thousands of splits and this is a
  * no-op; on a small corpus it is the difference between using 1 core
  * and all of them. */
object Par {
  def fanOut(df: DataFrame): DataFrame = {
    // Streaming DataFrames pass through: `.rdd` is illegal before
    // writeStream.start(), micro-batches carry their source's own
    // partitioning, and a blind repartition would add a per-batch
    // shuffle — so the map-only operators built on fanOut (chunking,
    // stats, fingerprints, signatures) stay streaming-safe unchanged.
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
