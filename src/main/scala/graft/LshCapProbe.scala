package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Timing probe for the [[graft.text.TextDedup.LshMaxBucket]] enforced
  * band-bucket cap: times the near-dup pair build (the ScaleStress
  * `state:pairs` row that measured 498.7 s UNCAPPED at sf10 — 29.5× the
  * sf1 cost for 10× docs) with the production cap, and prints the
  * occupancy audit's dropped-candidate-mass columns so the recall cost
  * of the cap is quantified next to its speedup.
  * Usage: `LshCapProbe [sfDir] [alsoUncapped]`. */
object LshCapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/target/sf10"
    val alsoUncapped = args.length > 1 && args(1) == "uncapped"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.session(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Par.fanOut(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("text"))
    println(s"[lshcap] corpus $sfDir: ${docs.count()} docs")

    def time(label: String)(df: => DataFrame): Unit = {
      Graft.releaseLeases(); spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[lshcap] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    time("audit")(graft.text.TextDedup.bandOccupancyAudit(docs))
    graft.text.TextDedup.bandOccupancyAudit(docs)
      .select("band", "max_bucket", "cand_pairs", "capped_pairs", "dropped_ppm")
      .collect().foreach(r => println(s"[lshcap] $r"))
    time(s"pairs capped(${graft.text.TextDedup.LshMaxBucket})")(
      graft.text.TextDedup.minhashLshPairs(docs))
    if (alsoUncapped)
      time("pairs UNCAPPED")(
        graft.text.TextDedup.minhashLshPairs(docs, maxBucket = Int.MaxValue))
    spark.stop()
  }
}
