package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HistQuantileSpec extends SparkSpec {
  import spark.implicits._

  test("uniform 0..99, width 10: estimates are the exact quantiles' bins") {
    val df = (0L until 100L).map(v => ("g", v)).toDF("g", "v")
    val got = HistQuantile.estimates(df, "g", "v", 10L,
      Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))).collect().head
    assert(got.getLong(1) == 100L)
    assert(got.getLong(2) == 40L) // rank 50 → value 49 → bin 40
    assert(got.getLong(3) == 80L) // rank 90 → value 89 → bin 80
    assert(got.getLong(4) == 90L) // rank 99 → value 98 → bin 90
  }

  test("estimate bin always contains the exact rank-selection quantile") {
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(500)(rnd.nextInt(1000).toLong)
    val df = vals.map(v => ("g", v)).toDF("g", "v")
    val sorted = vals.sorted
    val est = HistQuantile.estimates(df, "g", "v", 16L,
      Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))).collect().head
    for (((num, den), i) <- Seq((1, 2), (9, 10), (99, 100)).zipWithIndex) {
      val exact = sorted((num * vals.length + den - 1) / den - 1) // rank ⌈q·n⌉, 1-based
      val bin = est.getLong(2 + i)
      assert(bin <= exact && exact < bin + 16L, s"q=$num/$den exact=$exact bin=$bin")
    }
  }

  test("sketches merge by cellwise addition") {
    val a = (0L until 50L).map(v => ("g", v)).toDF("g", "v")
    val b = (25L until 100L).map(v => ("g", v)).toDF("g", "v")
    val merged = HistQuantile.sketch(a, "g", "v", 10L)
      .union(HistQuantile.sketch(b, "g", "v", 10L))
      .groupBy("g", "bin").agg(sum("cnt").as("cnt"))
    val whole = HistQuantile.sketch(a.union(b), "g", "v", 10L)
    assert(rowsOf(merged) == rowsOf(whole))
  }

  test("per-group independence: each group gets its own n and bins") {
    val df = ((0L until 10L).map(v => ("a", v)) ++ (100L until 300L).map(v => ("b", v)))
      .toDF("g", "v")
    val got = HistQuantile.estimates(df, "g", "v", 10L, Seq(("p50", 1, 2)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("a") == ((10L, 0L)))   // rank 5 → value 4 → bin 0
    assert(got("b") == ((200L, 190L))) // rank 100 → value 199 → bin 190
  }
}
