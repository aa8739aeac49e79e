package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-attribution probe for the q147 release diff (the [[Q140Probe]]
  * pattern): times the shared survivor scrub, ONE decision layer (in
  * releaseDiff's leased shape, so the number reconciles with the
  * production path), and the full diff so a regression pins to a
  * stage. Usage: `Q147Probe [sfDir]`. */
object Q147Probe {
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
    def quality = graft.warehouse.Warehouse.docQuality(spark, sfDir)
    def mixture = docs.select(col("source")).distinct()
      .withColumn("mix_ppm", lit(50000L))
    def surv = graft.pipeline.Release.survivors(
      docs, grams, clusters, quality)

    time("survivors (shared scrub)")(surv)
    time("one decision layer (thr+gate+rates+released)")({
      // same lease shape as releaseDiff.decide — unleased, g's
      // lineage would re-execute for rates AND released, timing a
      // shape the production path no longer has
      val s = Graft.lease(surv); s.count()
      val thr = Graft.lease(graft.pipeline.Release.gateThresholds(s))
      val g = Graft.lease(graft.pipeline.Release.gatedBy(s, thr))
      graft.pipeline.Release.releasedDocs(
        g, Graft.lease(graft.pipeline.Release.mixtureRates(g, mixture)))
    })
    time("full releaseDiff (from-scratch scrub)")(graft.pipeline.Release.releaseDiff(
      docs, grams, clusters, quality, mixture,
      isNew = pmod(col("doc_id"), lit(10)) === 7))
    // the registered q147 path: decision layers over the landed
    // release_survivors artifact (the scrub paid at warehouse build)
    time("releaseDiffFromSurvivors (artifact path — the q147 plan)")(
      graft.pipeline.Release.releaseDiffFromSurvivors(
        graft.warehouse.Warehouse.releaseSurvivors(spark, sfDir),
        docs.select(col("source")).distinct(), mixture,
        isNew = pmod(col("doc_id"), lit(10)) === 7))
    spark.stop()
  }
}
