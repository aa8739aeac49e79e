package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum

  test("zValue matches the reference interleave for exhaustive small inputs") {
    val rows = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b"), 4).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == mortonRef(a, b, 4), s"($a,$b)") }
  }

  test("zValue stays positive at full 31-bit width (long arithmetic, no int wrap)") {
    val got = Seq(((1L << 31) - 1, (1L << 31) - 1)).toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"), 31)).as[Long].head()
    assert(got == (1L << 62) - 1)
    assert(got > 0)
  }

  test("zoneMap reports per-bucket count and min/max of every dimension") {
    val df = Seq((0L, 5L, 7L), (1L, 3L, 9L), (10L, 100L, 1L)).toDF("k", "x", "y")
    val zm = ZOrder.zoneMap(df, "k", 10L, Seq("x", "y"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(zm(0L).getLong(1) == 2L) // n_rows
    assert(zm(0L).getLong(2) == 3L && zm(0L).getLong(3) == 5L) // min_x, max_x
    assert(zm(0L).getLong(4) == 7L && zm(0L).getLong(5) == 9L) // min_y, max_y
    assert(zm(1L).getLong(1) == 1L)
  }

  test("a 2-D box touches fewer z-order buckets than row-major buckets on a grid") {
    val grid = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)).toDF("a", "b")
    val bucketSize = 64L // 64 cells per bucket in both layouts
    def touched(keyed: org.apache.spark.sql.DataFrame, key: String): Long =
      ZOrder.zoneMap(keyed, key, bucketSize, Seq("a", "b"))
        .where(col("max_a") >= 16 && col("min_a") < 24 &&
               col("max_b") >= 16 && col("min_b") < 24)
        .count()
    val z = touched(grid.withColumn("z", ZOrder.zValue(col("a"), col("b"), 6)), "z")
    val r = touched(grid.withColumn("r", expr("a * 64 + b")), "r")
    // the 8×8 box lives in one 8×8-aligned z-neighborhood: 64 cells ≈ 1-4
    // buckets; row-major crosses 8 full rows → 8+ buckets
    assert(z < r, s"zorder touched $z, rowmajor touched $r")
    assert(z <= 4 && r >= 8)
  }
}
