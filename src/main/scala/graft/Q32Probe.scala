package graft
import org.apache.spark.scheduler._
object Q32Probe {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(master = "local[32]", shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")
    @volatile var ev = List.empty[(Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        ev ::= ((si.submissionTime.getOrElse(0L),
          f"stage ${si.stageId}%4d sub@ dur=${si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)}%6d ms tasks=${si.numTasks}%3d"))
      }
      override def onJobStart(j: SparkListenerJobStart): Unit =
        ev ::= ((j.time, s"JOB ${j.jobId} start"))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        ev ::= ((j.time, s"JOB ${j.jobId} end"))
    })
    for (i <- 1 to 2) {
      Graft.releaseLeases(); spark.catalog.clearCache(); System.gc(); ev = Nil
      val w0 = System.currentTimeMillis()
      val t0 = System.nanoTime()
      SparkEntry.queries("q32_ngram_jaccard")(spark, "/root/testdata/sf0.1")
        .write.mode("overwrite").format("noop").save()
      println(f"[probe] run $i total ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Thread.sleep(500)
      ev.sortBy(_._1).foreach { case (t, s) => println(f"[probe] +${t - w0}%6d ms  $s") }
    }
    spark.stop()
  }
}
