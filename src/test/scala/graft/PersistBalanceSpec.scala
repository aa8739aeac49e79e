package graft

/** Pins the session-cache contract ([[Graft]] scaladoc): operators may
  * persist shared intermediates and hand release to the caller — but
  * every such persist must be visible to the session's CacheManager so
  * one `spark.catalog.clearCache()` releases the lot. A persist that
  * slipped outside the catalog (e.g. a raw RDD `.cache()` kept in a
  * captured reference) would leak across the Bench/Verify per-query
  * teardown and accumulate over a 139-query run.
  */
class PersistBalanceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("clearCache releases every operator-persisted intermediate") {
    spark.catalog.clearCache() // drop whatever earlier suites left
    // persist-heavy representatives: margin mining (ea + cand persists),
    // the incremental scrub, and LSH near-dup pairing (bucketed persist)
    for (q <- Seq("q125_margin_mining", "q123_substr_scrub_incr", "q12_dedup_exact"))
      SparkEntry.queries(q)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "no persisted intermediates registered — the contract test went vacuous; " +
        "point it at queries that persist")
    spark.catalog.clearCache()
    val leaked = spark.sparkContext.getPersistentRDDs
    assert(leaked.isEmpty,
      s"clearCache left ${leaked.size} cached RDD(s) behind: " +
        leaked.values.map(_.name).mkString(", "))
  }
}
