package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** r15 measurement: run one registered query and print every stage's
  * wall time, task count and shuffle bytes — the local stand-in for the
  * Spark UI stage table (guide §7.1; spark.ui is off in this harness).
  * Usage: `StageTime <query> [sfDir] [runs]`. */
object StageTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.session(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    graft.warehouse.Warehouse.ensureMaterialized(spark, sfDir)
    val stages = ArrayBuffer.empty[(Int, Long, Long, Int, Long, Long, String)]
    var nJobs = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = synchronized { nJobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
        stages += ((si.stageId, wall, si.taskMetrics.executorRunTime, si.numTasks,
          si.taskMetrics.shuffleReadMetrics.totalBytesRead,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten,
          si.name.take(60)))
      }
    }
    (1 to runs).foreach { r =>
      Graft.releaseLeases(); spark.catalog.clearCache(); System.gc()
      stages.clear(); nJobs = 0
      if (r == runs) spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      if (r == runs) {
        Thread.sleep(500) // let the listener bus drain
        println(f"[stagetime] $name run$r wall $wall%.2f s, jobs $nJobs, stages ${stages.size}, " +
          f"sum-stage-wall ${stages.map(_._2).sum / 1e3}%.2f s")
        stages.sortBy(-_._2).take(25).foreach { case (id, w, rt, nt, sr, sw, nm) =>
          println(f"[stage] id=$id%-5d wall=${w / 1e3}%6.3f run=${rt / 1e3}%6.3f tasks=$nt%-3d shR=${sr / 1024}%8dK shW=${sw / 1024}%8dK  $nm")
        }
      } else println(f"[stagetime] $name run$r wall $wall%.2f s")
    }
    spark.stop()
  }
}
