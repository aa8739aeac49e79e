package graft

/** Variance probe: run one registered query N times in a single JVM with
  * bench-style teardown (clearCache + GC) between runs — distinguishes
  * "the query is slow" from "the query is jittery" before concluding
  * anything from a single bench number. Usage:
  * `BenchRepeat <name> [n] [sfDir]`. */
object BenchRepeat {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 5
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.session(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val times = (1 to n).map { i =>
      Graft.releaseLeases(); spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[repeat] $name run $i: $s%.2f s")
      s
    }
    println(f"[repeat] $name min ${times.min}%.2f median ${times.sorted.apply(n / 2)}%.2f max ${times.max}%.2f")
    spark.stop()
  }
}
