package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("two-level running total equals the sequential scan across bucket boundaries") {
    // keys straddle buckets of width 4: 0..3 | 4..7 | 8..
    val rows = Seq((0L, 5L), (1L, 2L), (3L, 7L), (4L, 1L), (7L, 10L), (8L, 4L), (12L, 6L))
    val got = PrefixSum.runningTotal(rows.toDF("k", "v"), "k", "v", bucketWidth = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    var acc = 0L
    val expected = rows.sortBy(_._1).map { case (k, v) => acc += v; k -> acc }.toMap
    assert(got == expected)
  }

  test("sparse keys: empty buckets contribute nothing and break nothing") {
    val rows = Seq((1L, 1L), (1000L, 2L), (1000000L, 3L))
    val got = PrefixSum.runningTotal(rows.toDF("k", "v"), "k", "v", bucketWidth = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == Map(1L -> 1L, 1000L -> 3L, 1000000L -> 6L))
  }

  test("packByBudget: pack id is the budget bucket of the row's starting offset") {
    // budget 10: offsets 0,5 → pack 0; 8 (straddles) → pack 0; 13 → pack 1
    val rows = Seq((1L, 5L), (2L, 3L), (3L, 5L), (4L, 4L))
    val got = PrefixSum.packByBudget(rows.toDF("k", "v"), "k", "v", budget = 10L, bucketWidth = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("matches sequential scan on random inputs and bucket widths") {
    val gen = for {
      n <- Gen.choose(0, 40)
      keys <- Gen.pick(n, 0L until 200L)
      vals <- Gen.listOfN(n, Gen.choose(0L, 50L))
      width <- Gen.oneOf(1L, 3L, 7L, 64L, 1024L)
    } yield (keys.toSeq.zip(vals), width)
    val prop = Prop.forAllNoShrink(gen) { case (rows, width) =>
      val got = PrefixSum.runningTotal(rows.toDF("k", "v"), "k", "v", width)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      var acc = 0L
      val expected = rows.sortBy(_._1).map { case (k, v) => acc += v; k -> acc }.toMap
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withInitialSeed(Seed(38L)), prop)
    assert(res.passed, res.status.toString)
  }
}
