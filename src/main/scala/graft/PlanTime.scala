package graft

/** r15 measurement: split a query's wall time into PLANNING (analysis +
  * optimization + physical planning, no execution) vs EXECUTION, per
  * query. Overhead-bound queries at bench scale show up as high
  * planning share — the fix is plan-size reduction (materialize/
  * truncate subtrees), not shuffle work. Usage: `PlanTime <q1,q2,...> [sfDir]`. */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.session(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    graft.warehouse.Warehouse.ensureMaterialized(spark, sfDir)
    names.foreach { n =>
      (1 to 3).foreach { i =>
        Graft.releaseLeases(); spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis→physical planning
        val t2 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val t3 = System.nanoTime()
        println(f"[plantime] $n run$i: build ${(t1 - t0) / 1e9}%.2f plan ${(t2 - t1) / 1e9}%.2f exec ${(t3 - t2) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
