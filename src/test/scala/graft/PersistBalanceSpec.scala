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

  test("releaseLeases releases every operator lease without touching caller caches") {
    Graft.releaseLeases(); spark.catalog.clearCache()
    // a caller-owned cache that a graft release must NOT clobber
    import spark.implicits._
    val mine = Seq(1, 2, 3).toDF("x").persist()
    mine.count()
    for (q <- Seq("q125_margin_mining", "q123_substr_scrub_incr", "q12_dedup_exact"))
      SparkEntry.queries(q)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    assert(Graft.releaseLeases() > 0,
      "no leases registered — operators stopped using Graft.lease; contract test vacuous")
    assert(Graft.releaseLeases() == 0, "release did not clear the registry")
    // only the caller's own persist survives
    val left = spark.sparkContext.getPersistentRDDs
    assert(left.size == 1,
      s"expected exactly the caller-owned cache to survive, got ${left.size}: " +
        left.values.map(_.name).mkString(", "))
    mine.unpersist()
  }

  test("REGISTRY SWEEP: every query returns with zero cached blocks after teardown") {
    // The contract must fail for a FUTURE leaking operator by
    // construction (the WarehouseMaintenanceSpec pattern): iterate the
    // whole registry, run each query through the Bench/Verify teardown
    // (releaseLeases + clearCache), and require zero retained blocks.
    // A new query that persists outside the lease discipline fails
    // here with its own name, not as a slow drift in a 163-query run.
    Graft.releaseLeases(); spark.catalog.clearCache()
    val leakers = scala.collection.mutable.ListBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      Graft.releaseLeases(); spark.catalog.clearCache()
      val left = spark.sparkContext.getPersistentRDDs
      if (left.nonEmpty) {
        leakers += s"$name -> [${left.values.map(_.name).mkString(", ")}]"
        left.values.foreach(_.unpersist(blocking = true)) // isolate blame per query
      }
    }
    assert(leakers.isEmpty,
      s"queries leaked cached blocks past releaseLeases+clearCache:\n  " +
        leakers.mkString("\n  "))
  }

  test("a warehouse build returns with zero cached blocks (leaseScope releases in finally)") {
    // fresh corpus dir → the memoized ensureMaterialized actually builds
    val tmp = java.nio.file.Files.createTempDirectory("whlease").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/$t.parquet"),
        java.nio.file.Paths.get(s"$tmp/$t.parquet"))
    Graft.releaseLeases(); spark.catalog.clearCache()
    graft.warehouse.Warehouse.ensureMaterialized(spark, tmp)
    val leaked = spark.sparkContext.getPersistentRDDs
    assert(leaked.isEmpty,
      s"warehouse build leaked ${leaked.size} cached RDD(s): " +
        leaked.values.map(_.name).mkString(", "))
    assert(Graft.releaseLeases() == 0,
      "warehouse build leaked leases into the global registry (escaped leaseScope)")
  }

  test("withCached releases in finally even when the body throws") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    intercept[RuntimeException] {
      Graft.withCached(df) { df.count(); throw new RuntimeException("boom") }
    }
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "withCached left the frame persisted after a throwing body")
  }
}
