package graft

/** Times one [[graft.warehouse.Warehouse.ensureMaterialized]] touch —
  * the probe for the per-artifact fingerprint scoping (r15): with
  * `-Dgraft.wh.vbump=ivf_assign:2` only the selector cone re-lands,
  * and this prints how long that took vs the 46 s full rebuild.
  * Usage: `WhTouch [sfDir]`. */
object WhTouch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.session(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val dir = graft.warehouse.Warehouse.ensureMaterialized(spark, sfDir)
    println(f"[whtouch] ensureMaterialized: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $dir")
    spark.stop()
  }
}
