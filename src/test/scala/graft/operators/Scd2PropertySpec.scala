package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** Property-based SCD2 invariants (SURVEY.md §5.3) over randomized event
  * streams and snapshots: the merges must uphold their contract for ANY
  * input shape, not just the golden traces. Seeded for reproducibility. */
class Scd2PropertySpec extends SparkSpec {
  import spark.implicits._

  private val Sentinel = "2999-12-31 23:59:59"

  private val eventsGen: Gen[List[(Long, String, Int)]] = for {
    n <- Gen.choose(1, 30)
    rows <- Gen.listOfN(n, for {
      id <- Gen.choose(1L, 5L)
      status <- Gen.oneOf("created", "paid", "completed", "deleted")
      minute <- Gen.choose(0, 10000)
    } yield (id, status, minute))
  } yield rows.distinctBy(r => (r._1, r._3)) // (id, event_time) unique per spec

  private def toEventsDf(rows: List[(Long, String, Int)]): DataFrame =
    rows.zipWithIndex
      .map { case ((id, st, m), i) => (id, st, f"2024-01-01 00:00:00", m, i.toLong) }
      .toDF("id", "status", "base", "m", "tiebreak")
      .select(col("id"), col("status"),
        (col("base").cast("timestamp") + expr("make_interval(0, 0, 0, 0, 0, m, 0)")).as("event_time"),
        col("tiebreak"))

  private def checkProp(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15).withInitialSeed(Seed(42L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("eventsMerge: one open version per id, contiguous chains, no (id,status) repeats, idempotent") {
    checkProp(Prop.forAllNoShrink(eventsGen) { rows =>
      rows.isEmpty || {
        val dim0 = graft.warehouse.Warehouse.emptyDim(spark,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("order_id", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("status", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("event_time", org.apache.spark.sql.types.TimestampType),
            org.apache.spark.sql.types.StructField("processed_time", org.apache.spark.sql.types.TimestampType),
            org.apache.spark.sql.types.StructField("start_time", org.apache.spark.sql.types.TimestampType),
            org.apache.spark.sql.types.StructField("end_time", org.apache.spark.sql.types.TimestampType))))
        val merged = Scd2.eventsMerge(dim0, toEventsDf(rows), "2024-02-01 00:00:00")
        val vs = merged.select(col("order_id"), col("status"),
            col("start_time").cast("string"), col("end_time").cast("string"))
          .as[(Long, String, String, String)].collect().toList

        val oneOpen = vs.groupBy(_._1).values.forall(_.count(_._4 == Sentinel) == 1)
        val contiguous = vs.groupBy(_._1).values.forall { g =>
          val sorted = g.sortBy(_._3)
          sorted.zip(sorted.tail).forall { case (a, b) => a._4 == b._3 }
        }
        val noRepeat = vs.groupBy(v => (v._1, v._2)).values.forall(_.size == 1)
        val again = Scd2.eventsMerge(merged, toEventsDf(rows), "2024-02-01 00:00:00")
        val idempotent = rowsOf(again) == rowsOf(merged)
        oneOpen && contiguous && noRepeat && idempotent
      }
    })
  }

  private val snapshotGen: Gen[List[(String, String, Double)]] = for {
    n <- Gen.choose(1, 8)
    rows <- Gen.listOfN(n, for {
      id <- Gen.oneOf("a", "b", "c", "d", "e")
      cat <- Gen.oneOf("X", "Y", "Z")
      price <- Gen.choose(1, 99).map(_.toDouble)
    } yield (id, cat, price))
  } yield rows.distinctBy(_._1)

  test("snapshotMerge: one open version per id, changed ids re-versioned, unchanged untouched, idempotent") {
    checkProp(Prop.forAllNoShrink(snapshotGen, snapshotGen) { (s1, s2) =>
      (s1.isEmpty || s2.isEmpty) || {
        val dim0 = graft.warehouse.Warehouse.emptyDim(spark,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("category", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("price", org.apache.spark.sql.types.DoubleType),
            org.apache.spark.sql.types.StructField("start_time", org.apache.spark.sql.types.TimestampType),
            org.apache.spark.sql.types.StructField("end_time", org.apache.spark.sql.types.TimestampType),
            org.apache.spark.sql.types.StructField("processed_time", org.apache.spark.sql.types.TimestampType))))
        val attrs = Seq("category", "price")
        val d1 = Scd2.snapshotMerge(dim0, s1.toDF("id", "category", "price"), attrs, "2024-01-01 00:00:00")
        val d2 = Scd2.snapshotMerge(d1, s2.toDF("id", "category", "price"), attrs, "2024-01-02 00:00:00")
        val vs = d2.select(col("id"), col("category"), col("price"),
            col("start_time").cast("string"), col("end_time").cast("string"))
          .as[(String, String, Double, String, String)].collect().toList

        val oneOpen = vs.groupBy(_._1).values.forall(_.count(_._5 == Sentinel) == 1)
        val m1 = s1.map(r => r._1 -> (r._2, r._3)).toMap
        val m2 = s2.map(r => r._1 -> (r._2, r._3)).toMap
        // every id changed between snapshots carries exactly two versions
        val changed = m1.keySet.intersect(m2.keySet).filter(id => m1(id) != m2(id))
        val reVersioned = changed.forall(id => vs.count(_._1 == id) == 2)
        val unchangedIds = m1.keySet.intersect(m2.keySet).filter(id => m1(id) == m2(id))
        val untouched = unchangedIds.forall(id => vs.count(_._1 == id) == 1)
        val again = Scd2.snapshotMerge(d2, s2.toDF("id", "category", "price"), attrs, "2024-01-02 00:00:00")
        val idempotent = rowsOf(again) == rowsOf(d2)
        oneOpen && reVersioned && untouched && idempotent
      }
    })
  }
}
