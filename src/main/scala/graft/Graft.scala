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
  *
  * == Session-cache contract ==
  * Operators persist shared intermediates (a candidate table probed by
  * both a denominator aggregate and the scoring join, a bucketed side
  * probed twice, …) and deliberately do NOT unpersist them before
  * returning: the returned DataFrame is lazy and still executes over
  * those intermediates — an eager unpersist inside the builder would
  * defeat the sharing it exists for. The caller owns release: run
  * `spark.catalog.clearCache()` after consuming a query's result (all
  * graft entry points — Bench, BenchGuard, Verify — do this between
  * queries). Every operator persist is registered through the session's
  * CacheManager, so clearCache releases ALL of it —
  * [[graft]] PersistBalanceSpec pins that invariant. Long-lived
  * sessions that interleave graft queries with other work can instead
  * unpersist selectively via `spark.sharedState.cacheManager`; at
  * MEMORY_AND_DISK default storage the worst case of NOT clearing is
  * eviction, never OOM-by-cache.
  */
object Graft {
  def session(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
              shufflePartitions: Int = 32,
              appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // spark.sql.extensions is a STATIC conf: if getOrCreate returned an
    // already-running session built without it, the native functions are
    // silently absent and the first operator call fails with an opaque
    // "Undefined function". Fail here, with instructions, instead.
    require(spark.catalog.functionExists("md5_prefix"),
      "Graft.session returned a pre-existing SparkSession that was built without " +
        "graft's extensions (spark.sql.extensions is static and cannot be applied " +
        "retroactively). Start the JVM's first session via Graft.session, or add " +
        "spark.sql.extensions=graft.functions.GraftExtensions to its builder/submit conf.")
    // The repo's deliberate global windows (q52 day-cardinality fold,
    // q61's ntile over the deduped key grid, the skew audit's
    // frequency-of-frequency median) all run over inputs bounded by
    // construction — PlanShapeSpec pins the window counts. WindowExec
    // still WARNs "No Partition Defined" per execution, and dozens of
    // those lines drown the bench/verify stdout tail the driver parses
    // (~2 KB). Silence exactly that logger; real warnings stay on.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    spark
  }
}
