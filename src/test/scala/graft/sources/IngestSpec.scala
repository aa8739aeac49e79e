package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class IngestSpec extends SparkSpec {

  test("bucketed tables equi-join with zero shuffle") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the in-memory catalog forgets tables between JVM runs but their
    // warehouse directories survive — clear both before writing
    Seq("bk_facts", "bk_other").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$t")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    val facts = (1 to 1000).map(i => (i.toLong % 100, s"f$i")).toDF("k", "a")
    val other = (1 to 500).map(i => (i.toLong % 100, i)).toDF("k", "b")
    Ingest.writeBucketed(facts, "bk_facts", 4, Seq("k"), Seq("k"))
    Ingest.writeBucketed(other, "bk_other", 4, Seq("k"), Seq("k"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      val joined = spark.table("bk_facts").join(spark.table("bk_other"), "k")
      assert(joined.count() == 5000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("appendPartitioned lays out batch-date partitions that prune at the scan") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files.createTempDirectory("graft_part").toString + "/fact"
    Ingest.appendPartitioned(
      Seq(("a", 1)).toDF("id", "v").withColumn("processed_date", lit("2019-01-01")), path)
    Ingest.appendPartitioned(
      Seq(("b", 2)).toDF("id", "v").withColumn("processed_date", lit("2019-01-02")), path)

    val pruned = spark.read.parquet(path).where(col("processed_date") === "2019-01-02")
    assert(pruned.select("id").as[String].collect().toSeq == Seq("b"))
    // the filter lands in the scan's PartitionFilters, not a post-scan Filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("processed_date"),
      s"expected partition pruning in:\n$plan")
  }

  test("ready / ensureTable / append cover the remaining DDL surface") {
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val path = s"$base/t"
    val schema = StructType(Seq(StructField("id", StringType), StructField("v", IntegerType)))

    assert(!Ingest.ready(spark, path))
    Ingest.ensureTable(spark, path, schema)          // creates empty
    assert(Ingest.ready(spark, path))
    assert(spark.read.parquet(path).count() == 0)
    Ingest.ensureTable(spark, path, schema)          // idempotent no-op

    import spark.implicits._
    Ingest.append(Seq(("a", 1)).toDF("id", "v"), path)
    Ingest.append(Seq(("b", 2)).toDF("id", "v"), path)
    assert(spark.read.parquet(path).count() == 2)
  }
  import spark.implicits._

  test("readCsv reads the reference sample products CSV and stamps processed_time") {
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("title", StringType),
      StructField("category", StringType), StructField("price", DecimalType(18, 2))))
    val df = Ingest.readCsv(spark, "/root/reference/sample-data/products_2019-01-01.csv",
      schema, "2019-01-01 00:00:00")
    assert(df.count() == 9) // FIXTURES.md §A: 9 data rows
    assert(df.schema.fieldNames.last == "processed_time")
    assert(df.where(col("processed_time") === to_timestamp(lit("2019-01-01 00:00:00"))).count() == 9)
    // quoted CJK titles with commas survive CSV parsing
    assert(df.where(col("id") === "1000").head().getAs[String]("title").contains("8t"))
  }

  test("readCsvQuarantine dead-letters malformed lines instead of aborting or dropping") {
    val dir = java.nio.file.Files.createTempDirectory("csvq")
    java.nio.file.Files.writeString(dir.resolve("feed.csv"),
      "id,price\n1,10.50\nnot-a-row-at-all,\"unclosed\n3,7.25\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("price", DecimalType(18, 2))))
    val df = Ingest.readCsvQuarantine(spark, dir.toString, schema, "2019-01-01 00:00:00")
      .cache()
    val good = df.where(col("_corrupt_record").isNull)
    val dead = df.where(col("_corrupt_record").isNotNull)
    // both healthy rows parse; the malformed line survives as a
    // quarantine row carrying its raw text (nothing thrown, nothing
    // silently dropped)
    assert(good.count() == 2 && dead.count() == 1)
    assert(dead.head().getAs[String]("_corrupt_record").startsWith("not-a-row"))
    assert(df.schema.fieldNames.contains("processed_time"))
    df.unpersist()
  }

  test("appendIfAbsent drops rows whose key already exists (ON CONFLICT DO NOTHING)") {
    val existing = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    val incoming = Seq(("b", 99), ("c", 3)).toDF("k", "v")
    val out = Ingest.appendIfAbsent(incoming, existing, Seq("k"))
    assertSameRows(out.select(col("k"), col("v").cast("string")), Seq(Seq("c", "3")))
  }

  test("overwriteSwap atomically replaces a parquet path") {
    val dir = java.nio.file.Files.createTempDirectory("swap").toString + "/t"
    Seq(1, 2, 3).toDF("x").write.parquet(dir)
    val v2 = spark.read.parquet(dir).withColumn("x", col("x") * 10)
    Ingest.overwriteSwap(spark, v2, dir)
    assert(spark.read.parquet(dir).agg(sum("x")).head().getLong(0) == 60)
  }

  test("compact collapses many small append files into row-budgeted ones, data intact") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    for (b <- 0 until 12) // 12 tiny appends → ≥12 part files
      Ingest.append((b * 10 until b * 10 + 10).toDF("x").repartition(1), dir)
    def partFiles = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(partFiles >= 12)
    val files = Ingest.compact(spark, dir, targetRowsPerFile = 40L)
    assert(files == 3) // 120 rows / 40 per file
    assert(partFiles == 3)
    assert(spark.read.parquet(dir).orderBy("x").as[Int].collect().toSeq == (0 until 120))
  }

  test("overwriteSwap recovers from a crash at every window (fault injection)") {
    import spark.implicits._
    def fs = new org.apache.hadoop.fs.Path("/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val v1 = Seq(1, 2, 3).toDF("x")
    val v2 = Seq(10, 20).toDF("x")
    def readSet(dir: String) =
      spark.read.parquet(dir).as[Int].collect().toSet
    def assertConverges(dir: String): Unit = {
      // the recovery contract: RE-RUNNING the same swap lands v2
      // completely and clears every side dir
      Ingest.overwriteSwap(spark, v2, dir)
      assert(readSet(dir) == Set(10, 20))
      assert(!fs.exists(p(dir + ".swap")), "leftover .swap after recovery")
      assert(!fs.exists(p(dir + ".old")), "leftover .old after recovery")
    }

    // window 1: killed after the .swap write, before any rename —
    // reader still sees the complete OLD table
    val w1 = java.nio.file.Files.createTempDirectory("swapw1").toString + "/t"
    Ingest.overwriteSwap(spark, v1, w1)
    v2.write.parquet(w1 + ".swap.partial") // simulate: swap written…
    fs.rename(p(w1 + ".swap.partial"), p(w1 + ".swap")) // …then crash
    assert(readSet(w1) == Set(1, 2, 3), "old table must stay complete")
    assert(Ingest.ready(spark, w1))
    assertConverges(w1)

    // window 2: killed between the two renames — path ABSENT (reported
    // not-ready, never partial), old version parked in .old
    val w2 = java.nio.file.Files.createTempDirectory("swapw2").toString + "/t"
    Ingest.overwriteSwap(spark, v1, w2)
    v2.write.parquet(w2 + ".swap")
    fs.rename(p(w2), p(w2 + ".old")) // crash after rename #1
    assert(!Ingest.ready(spark, w2), "absence window must read as not-ready")
    assertConverges(w2)

    // window 3: killed after the final rename, before the .old delete —
    // reader already sees the complete NEW table
    val w3 = java.nio.file.Files.createTempDirectory("swapw3").toString + "/t"
    Ingest.overwriteSwap(spark, v1, w3)
    v1.write.parquet(w3 + ".old") // simulate the parked old version
    assert(readSet(w3) == Set(1, 2, 3))
    assertConverges(w3)

    // a partial .swap (no _SUCCESS) from a kill MID-write is ignored by
    // recovery: the swap rewrites it from scratch
    val w4 = java.nio.file.Files.createTempDirectory("swapw4").toString + "/t"
    Ingest.overwriteSwap(spark, v1, w4)
    fs.mkdirs(p(w4 + ".swap"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(w4 + ".swap/part-00000.parquet"), "garbage")
    assert(readSet(w4) == Set(1, 2, 3))
    assertConverges(w4)
  }

  test("readyRecovering completes or rolls back an interrupted swap (maintainer reads)") {
    import spark.implicits._
    def fs = new org.apache.hadoop.fs.Path("/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val v1 = Seq(1, 2, 3).toDF("x")
    val v2 = Seq(10, 20).toDF("x")
    def readSet(dir: String) =
      spark.read.parquet(dir).as[Int].collect().toSet

    // between-renames crash, COMPLETE .swap parked: plain ready() says
    // false — the misread that made a maintainer rebuild corpus state
    // from empty; readyRecovering rolls FORWARD to the new version
    val f = java.nio.file.Files.createTempDirectory("recf").toString + "/t"
    Ingest.overwriteSwap(spark, v1, f)
    v2.write.parquet(f + ".swap")
    fs.rename(p(f), p(f + ".old")) // crash after rename #1
    assert(!Ingest.ready(spark, f))
    assert(Ingest.readyRecovering(spark, f), "forward recovery must land")
    assert(readSet(f) == Set(10, 20), "recovered table must be the NEW version")
    assert(!fs.exists(p(f + ".old")) && !fs.exists(p(f + ".swap")))

    // same window but the .swap never finished (no _SUCCESS): roll BACK
    // to the parked old version
    val b = java.nio.file.Files.createTempDirectory("recb").toString + "/t"
    Ingest.overwriteSwap(spark, v1, b)
    fs.rename(p(b), p(b + ".old"))
    fs.mkdirs(p(b + ".swap"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(b + ".swap/part-00000.parquet"), "garbage")
    assert(Ingest.readyRecovering(spark, b), "rollback recovery must land")
    assert(readSet(b) == Set(1, 2, 3), "recovered table must be the OLD version")
    assert(!fs.exists(p(b + ".old")) && !fs.exists(p(b + ".swap")))

    // nothing to recover: behaves exactly like ready()
    val n = java.nio.file.Files.createTempDirectory("recn").toString + "/t"
    assert(!Ingest.readyRecovering(spark, n))
    Ingest.overwriteSwap(spark, v1, n)
    assert(Ingest.readyRecovering(spark, n) && readSet(n) == Set(1, 2, 3))
  }
}
