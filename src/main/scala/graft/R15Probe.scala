package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r15 optimization-round attribution probe: times the SUBTREES of the
  * registry's actual q140/q147/q141/q137 compositions (the artifact-
  * reading paths — Q140Probe times the from-docs path) so optimization
  * effort lands on the stage that actually costs. Each subtree is its
  * own noop action with bench-style teardown. Usage: `R15Probe [sfDir]`. */
object R15Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.session(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    graft.warehouse.Warehouse.ensureMaterialized(spark, sfDir)
    val wh = graft.warehouse.Warehouse
    def time(label: String)(df: => DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        Graft.releaseLeases(); spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[r15probe] $label: ${times.map(t => f"$t%.2f").mkString(" ")} s")
    }

    // --- q140 subtrees ---
    time("q140 surv-scan-only")(wh.releaseSurvivors(spark, sfDir))
    (1 to 3).foreach { i =>
      Graft.releaseLeases(); spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val surv = graft.Graft.lease(wh.releaseSurvivors(spark, sfDir))
      surv.count()
      println(f"[r15probe] q140 lease+count run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("q140 raw-counts")(Tables.documents(spark, sfDir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs_raw")))
    def mixDf = SparkEntry.queries("q127_domain_mixture")(spark, sfDir)
      .select(col("source"), col("mix_ppm"))
    time("q140 domainMixture")(mixDf)
    time("q140 thresholds")({
      val surv = wh.releaseSurvivors(spark, sfDir)
      graft.pipeline.Release.gateThresholds(surv)
    })
    def releasedSet: DataFrame = {
      val surv = graft.Graft.lease(wh.releaseSurvivors(spark, sfDir))
      surv.count()
      val thr = graft.pipeline.Release.gateThresholds(surv)
      val g = graft.pipeline.Release.gatedBy(surv, thr)
      val rates = graft.pipeline.Release.mixtureRates(g, mixDf)
      graft.pipeline.Release.releasedDocs(g, rates)
    }
    time("q140 released-only")(releasedSet)
    time("q140 tokenWindows(released)")(graft.text.Chunking.tokenWindows(
      releasedSet.select(col("doc_id"), col("clean_text").as("text"))))
    time("q140 chunkPack(released)")({
      val surv = graft.Graft.lease(wh.releaseSurvivors(spark, sfDir))
      surv.count()
      val thr = graft.pipeline.Release.gateThresholds(surv)
      val g = graft.pipeline.Release.gatedBy(surv, thr)
      val rates = graft.pipeline.Release.mixtureRates(g, mixDf)
      val rel = graft.pipeline.Release.releasedDocs(g, rates)
      graft.pipeline.Release.chunkPack(rel)
    })
    time("q140 full")(SparkEntry.queries("q140_release_card")(spark, sfDir))

    // --- q147 subtrees ---
    time("q147 full")(SparkEntry.queries("q147_release_diff")(spark, sfDir))

    // --- q141 subtrees ---
    time("q141 full")(SparkEntry.queries("q141_index_erasure")(spark, sfDir))

    // --- q137 ---
    time("q137 full")(SparkEntry.queries("q137_margin_mining_incr")(spark, sfDir))

    spark.stop()
  }
}
