package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.{col, expr, xxhash64}

/** Benchmark harness — one JSON line on stdout AND written to
  * `BENCH.json` (path overridable via SPARK_GRAFT_BENCH_OUT), so the
  * driver can parse it even if a logger decorates stdout.
  *
  * Each query is fully materialized through the `noop` sink (forces every
  * operator to run, unlike `count()` which lets Catalyst prune work).
  * Failures are reported per-query in an `errors` map instead of being
  * swallowed — a broken query must never masquerade as a fast one.
  * An optional warmup pass at a small sf (SPARK_GRAFT_WARM_DIR, default
  * sf0.001 if present) triggers codegen/JIT so the measured numbers
  * reflect steady-state execution, not JVM warmup.
  */
object Bench {
  /** Post-cold runs above this cost report a median of 3 samples;
    * below it a single sample (absolute jitter is sub-budget noise). */
  val MedianFloorSec = 1.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val benchOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    val warmDir = sys.env.get("SPARK_GRAFT_WARM_DIR")
      .orElse(Some("/root/testdata/sf0.001").filter(d => Files.isDirectory(Paths.get(d))))
    val spark = Graft.session(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    // Between-query teardown, OUTSIDE the timed region: operators persist
    // shared intermediates; drop them so measurements are independent and
    // memory stays flat. The explicit GC lets the ContextCleaner reap dead
    // broadcast/shuffle state — with a large heap it otherwise accumulates
    // across dozens of queries and degrades late queries unpredictably.
    // Charging these pauses to the query being measured would skew every
    // reported time by up to seconds (round-2 advice).
    def cleanup(): Unit = {
      Graft.releaseLeases(); spark.catalog.clearCache()
      System.gc()
    }

    def run(dir: String, name: String): Option[String] =
      try {
        SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
        None
      }
      catch { case e: Throwable => Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200)) }

    // TWO warmup passes: heavy-codegen queries (q32-family) reach JIT
    // steady state only on their second execution — one pass left the
    // first timed run paying 2–6× (measured 10–31 s vs 5 s for the same
    // binary); the second pass costs ~30 s of untimed wall once.
    warmDir.foreach(w => (1 to 2).foreach(_ =>
      SparkEntry.queries.keys.foreach { n => cleanup(); run(w, n) }))

    // Host-drift calibration sentinel (r16, per the r15 verdict): a
    // FIXED synthetic workload — 150M xxhash64+sum in ONE task, so the
    // number is a pure single-core-throughput probe independent of
    // SPARK_GRAFT_CPUS and of the data directory — timed after warmup
    // and reported as sentinel_sec in both the stdout line and
    // BENCH.json. Two rounds running, the headline total moved for
    // environmental reasons (r14 +17%, r15 0.86×) and needed manual
    // same-host A/B re-runs of old binaries to exonerate the code;
    // future rounds can normalize totals by the sentinel instead.
    // bit_xor, not sum: summing 150M full-range 64-bit hashes overflows
    // a BIGINT under ANSI mode (measured: the first sentinel crashed the
    // bench); xor folds the same per-row work with no overflow.
    val tSen = System.nanoTime()
    spark.range(0L, 150000000L, 1L, 1)
      .select(xxhash64(col("id")).as("h"))
      .agg(expr("bit_xor(h)"))
      .write.mode("overwrite").format("noop").save()
    val senSec = (System.nanoTime() - tSen) / 1e9
    // PARALLEL twin (one partition per core): this round's mid-bench
    // read ~1.5× on untouched queries while the single-task sentinel
    // stayed flat — the host throttles multi-core work independently of
    // single-core speed, so drift needs both probes. Comparable across
    // runs at the SAME SPARK_GRAFT_CPUS only (per-core work is fixed at
    // 20M hashes).
    val par = spark.sparkContext.defaultParallelism
    val tSenP = System.nanoTime()
    spark.range(0L, 20000000L * par, 1L, par)
      .select(xxhash64(col("id")).as("h"))
      .agg(expr("bit_xor(h)"))
      .write.mode("overwrite").format("noop").save()
    val senParSec = (System.nanoTime() - tSenP) / 1e9

    // The warehouse layer materializes dims/facts once per corpus and the
    // analytic queries read the parquet (mirrors the reference DAG: tables
    // are built nightly, queries just read them). Build it before the
    // timed loop and report the build cost as its own metric.
    val tWh = System.nanoTime()
    val whErr = try { graft.warehouse.Warehouse.ensureMaterialized(spark, sfDir); None }
                catch { case e: Throwable => Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200)) }
    val whSec = (System.nanoTime() - tWh) / 1e9

    // Timed runs per query, same sf, cache cleared between: the FIRST
    // sample (cold) carries per-construction planning/codegen jitter
    // (measured spread up to 5× on join-heavy queries — fresh
    // expression ids defeat the codegen cache every construction); the
    // post-cold samples are the reproducible per-query cost. The
    // headline total stays the cold sum for round-over-round
    // comparability. Queries whose first post-cold run exceeds
    // [[MedianFloorSec]] get TWO more post-cold runs and report the
    // MEDIAN of the three (BenchRepeat's discipline — one sample is
    // not evidence at ±15% host variance; the r12 driver number read
    // +19% on an unchanged registry from exactly this); the sub-second
    // tail keeps single samples so total wall stays inside the driver
    // budget (the tail's absolute jitter is noise in the total).
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      cleanup()
      val t0 = System.nanoTime()
      val err = run(sfDir, name)
      val cold = (System.nanoTime() - t0) / 1e9
      def timed(): Double = {
        cleanup()
        val t = System.nanoTime()
        run(sfDir, name)
        (System.nanoTime() - t) / 1e9
      }
      cleanup()
      val t1 = System.nanoTime()
      val err2 = run(sfDir, name)
      val steady = (System.nanoTime() - t1) / 1e9
      val samples =
        if (err.orElse(err2).isDefined || steady < MedianFloorSec) Seq(steady)
        else steady +: Seq.fill(2)(timed())
      val median = samples.sorted.apply(samples.size / 2)
      (name, cold, steady, median, err.orElse(err2))
    }
    def q(s: String): String = Json.quote(s)
    val qs = results.map { case (k, v, _, _, _) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    val qsSteady = results.map { case (k, _, v, _, _) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    val qsMedian = results.map { case (k, _, _, v, _) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    val errs = (results.collect { case (k, _, _, _, Some(e)) => s"${q(k)}:${q(e)}" } ++
      whErr.map(e => s"${q("warehouse_build")}:${q(e)}")).mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val totalSteady = results.map(_._3).sum
    val totalMedian = results.map(_._4).sum
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_steady":$qsSteady,"queries_steady_median":$qsMedian,"total_steady_sec":$totalSteady,"total_steady_median_sec":$totalMedian,"errors":$errs,"warehouse_build_sec":$whSec,"sentinel_sec":$senSec,"sentinel_par_sec":$senParSec,"sf":${q(sfDir)}}"""
    Files.writeString(Paths.get(benchOut), fullJson + "\n")
    // The stdout line MUST stay short: the driver captures only the last
    // ~2000 chars of output, and the round-5 line (72-query cold+steady
    // maps, ~5 KB) overflowed it — BENCH_r05.json recorded parsed:null.
    // Per-query maps live in BENCH.json only; stdout carries the summary
    // the perf gate parses. Error messages are truncated and capped so a
    // pathological round cannot blow the line either.
    val nErrors = results.count(_._5.isDefined) + whErr.size
    val errsShort = (results.collect { case (k, _, _, _, Some(e)) => (k, e) } ++
        whErr.map(("warehouse_build", _)))
      .take(8).map { case (k, e) => s"${q(k)}:${q(e.take(40))}" }
      .mkString("{", ",", "}")
    // r16: restore per-query driver visibility (the r15 PERF gate had
    // per_query:{} because only this truncated line survives) — the
    // TOP-20 steady-medians ride the summary line, 3-decimal, ~800
    // bytes; the full map stays in BENCH.json. Everything still ONE
    // JSON line, sized inside the driver's ~2000-char tail capture
    // even alongside the capped errors map.
    val top = results.sortBy(-_._4).take(20)
      // Locale.ROOT: a comma decimal separator would break the JSON
      .map { case (k, _, _, m, _) =>
        s"${q(k)}:" + "%.3f".formatLocal(java.util.Locale.ROOT, m) }
      .mkString("{", ",", "}")
    val summary =
      s"""{"metric":"total","value":$total,"unit":"sec","total_steady_sec":$totalSteady,"total_steady_median_sec":$totalMedian,"n_queries":${results.size},"n_errors":$nErrors,"errors":$errsShort,"warehouse_build_sec":$whSec,"sentinel_sec":$senSec,"sentinel_par_sec":$senParSec,"top_steady_median":$top,"sf":${q(sfDir)},"detail":"per-query times in BENCH.json"}"""
    println(summary)
    spark.stop()
  }
}
