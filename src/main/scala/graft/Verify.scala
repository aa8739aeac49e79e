package graft

import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names — dump only those
    // (scale spot-checks on big local corpora; the driver passes 2 args
    // and gets the full registry as before)
    val only = args.lift(2).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Graft.session(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        Graft.releaseLeases(); spark.catalog.clearCache() // free operator-persisted intermediates
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // Expose the materialized warehouse (codebooks, merge rules) to the
    // path-reading oracles BEFORE dumping the SQL: oracleSql substitutes
    // the absolute dir at call time. The queries above already built it
    // (memoized), so this is a cache hit.
    try {
      val wh = graft.warehouse.Warehouse.ensureMaterialized(spark, sfDir)
      System.setProperty("graft.oracle.whdir", new java.io.File(wh).getAbsolutePath)
    } catch { case e: Throwable =>
      System.err.println(s"[verify] warehouse materialization failed: ${e.getMessage}")
    }
    def q(s: String): String = Json.quote(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
