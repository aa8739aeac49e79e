package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-attribution probe for the q140 release capstone: times each
  * stage of [[graft.pipeline.Release.releaseCard]]'s chain in
  * isolation (own noop action, cache cleared between) so a budget
  * regression can be pinned to a stage instead of re-deriving the
  * whole chain's profile by bisection. Usage: `Q140Probe [sfDir]`. */
object Q140Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.session(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    graft.warehouse.Warehouse.ensureMaterialized(spark, sfDir)
    def time(label: String)(df: => DataFrame): Unit = {
      val times = (1 to 2).map { _ =>
        Graft.releaseLeases(); spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label: cold ${times.head}%.2f s steady ${times.last}%.2f s")
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
    def grams = graft.warehouse.Warehouse.gramOccurrences(spark, sfDir)
    def clusters = graft.warehouse.Warehouse.nearDupClusters(spark, sfDir)
    def keepers = clusters.where(col("doc_id") === col("cluster_id")).select("doc_id")
    def quality = graft.warehouse.Warehouse.docQuality(spark, sfDir)

    time("keepers")(keepers)
    time("dupOccurrences")(graft.text.SegmentDedup.dupOccurrences(grams))
    time("scrub(all docs)")(graft.text.SegmentDedup.scrubExactSubstrFromGrams(
      docs.select(col("doc_id"), col("text")), grams))
    time("scrub(keepers only)")(graft.text.SegmentDedup.scrubExactSubstrFromGrams(
      docs.select(col("doc_id"), col("text")).join(keepers, Seq("doc_id")), grams))
    time("quality join")(docs.select("doc_id").join(quality, Seq("doc_id")))
    time("chunk+pack of raw keepers")({
      val ch = graft.text.Chunking.tokenWindows(
          docs.join(keepers, Seq("doc_id")).select(col("doc_id"), col("text")))
        .where(col("n_chunk_tokens") > 0)
        .withColumn("k", col("doc_id") * 1024 + col("chunk_id"))
      graft.operators.PrefixSum.packByBudget(ch, "k", "n_chunk_tokens", 512L)
    })
    time("full releaseCard")(graft.pipeline.Release.releaseCard(
      docs, grams, clusters, quality,
      docs.select(col("source")).distinct().withColumn("mix_ppm", lit(50000L))))
    spark.stop()
  }
}
