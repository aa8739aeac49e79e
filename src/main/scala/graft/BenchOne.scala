package graft


/** Profile a single registered query: usage `BenchOne <name> [sfDir]`.
  * Prints wall time and the formatted physical plan — the explain-audit
  * loop for plan iteration. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.session(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "WARN"))
    sys.env.get("SPARK_GRAFT_WARMONE").foreach { wd =>
      val t = System.nanoTime()
      SparkEntry.queries(name)(spark, wd).write.mode("overwrite").format("noop").save()
      println(f"[benchone] $name warmup@$wd: ${(System.nanoTime() - t) / 1e9}%.2f s")
      if (sys.env.contains("SPARK_GRAFT_CLEARCACHE")) {
        Graft.releaseLeases(); spark.catalog.clearCache()
      }
    }
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    println(f"[benchone] $name cold: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
    println(f"[benchone] $name warm: ${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
