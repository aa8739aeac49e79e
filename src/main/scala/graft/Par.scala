package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // Estimate the scan's split count from the file relation WITHOUT
    // constructing the RDD lineage (`df.rdd` runs analysis + physical
    // planning + RDD build on every call; the analyzed plan + a file
    // listing the FileIndex has already cached is much lighter). The
    // arithmetic mirrors FilePartition.maxSplitBytes: splits of size
    // min(maxPartitionBytes, max(openCost, bytesPerCore)). Every
    // fanOut call site feeds a single-relation scan projection; any
    // other shape falls back to the exact RDD probe.
    val conf = spark.sessionState.conf
    val analyzed = df.queryExecution.analyzed
    val leaves = analyzed.collectLeaves()
    val est: Option[Long] = leaves match {
      case Seq(l: LogicalRelation) if l.relation.isInstanceOf[HadoopFsRelation] =>
        val r = l.relation.asInstanceOf[HadoopFsRelation]
        val openCost = conf.filesOpenCostInBytes
        val nFiles = math.max(1L, r.location.inputFiles.length.toLong)
        val totalBytes = math.max(1L, r.location.sizeInBytes) + nFiles * openCost
        val minPartitionNum = conf.filesMinPartitionNum.getOrElse(target)
        val bytesPerCore = totalBytes / math.max(1, minPartitionNum)
        val maxSplit = math.min(conf.filesMaxPartitionBytes,
          math.max(openCost, bytesPerCore))
        Some((totalBytes + maxSplit - 1) / maxSplit)
      case _ => None
    }
    val parts = est.getOrElse(df.rdd.getNumPartitions.toLong)
    if (parts < target) df.repartition(target) else df
  }
}
