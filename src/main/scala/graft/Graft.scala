package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession configured the way graft's
  * operators expect it. Using any other session works too, as long as
  * it registers [[graft.functions.GraftExtensions]] (the native
  * md5_prefix / vec_dot / minhash_sig / simhash32 / winnow_fps
  * functions) and pins the session timezone to UTC (timestamp renders
  * feed hash-compared results).
  *
  * `shufflePartitions` should track the executor-core budget of the
  * deployment — the repo default (32) matches the local[32] harness;
  * a real cluster sets cores and lets AQE coalesce from there.
  */
object Graft {
  def session(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
              shufflePartitions: Int = 32,
              appName: String = "graft"): SparkSession =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
