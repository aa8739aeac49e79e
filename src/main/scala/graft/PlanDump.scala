package graft

import java.nio.file.{Files, Paths}

/** Optimization-round tooling: dump `.explain("formatted")` for a set of
  * registered queries to files, one JVM for the whole batch. Usage:
  * `PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]` — writes
  * `<outDir>/<query>_<suffix>.txt` per query. The judge checks plan-shape
  * claims against these files (plans/r15/). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names: Seq[String] =
      if (args(2) == "ALL") SparkEntry.queries.keys.toSeq.sorted else args(2).split(",").toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.session(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    // Warehouse artifacts must exist before plans resolve against them.
    graft.warehouse.Warehouse.ensureMaterialized(spark, sfDir)
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
        println(s"[plandump] wrote ${n}_$suffix.txt (${plan.length} chars)")
      } catch {
        case e: Throwable => println(s"[plandump] FAIL $n: ${e.getMessage}")
      } finally { Graft.releaseLeases(); spark.catalog.clearCache() }
    }
    spark.stop()
  }
}
