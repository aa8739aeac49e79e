package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join == cross-join reference on overlapping intervals") {
    val points = Seq(0.5, 10.0, 64.0, 64.1, 100.0, 999.9, 1000.0, 1500.0)
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
    val intervals = Seq(
      ("a", 0.0, 100.0),      // spans 2 bins at w=64
      ("b", 50.0, 70.0),      // overlaps a
      ("c", 64.0, 64.0),      // degenerate single-point interval on a bin edge
      ("d", 900.0, 2000.0),   // wide
      ("e", 3000.0, 3001.0))  // matches nothing
      .toDF("name", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", binWidth = 64.0)
      .select("pid", "name").as[(Long, String)].collect().toSet
    val ref = points.crossJoin(intervals)
      .where(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "name").as[(Long, String)].collect().toSet
    assert(ref.nonEmpty && got == ref,
      s"binning must not drop/add matches: missing ${ref.diff(got)}, extra ${got.diff(ref)}")
  }

  test("each matching (point, interval) pair appears exactly once") {
    val points = Seq((1L, 32.0)).toDF("pid", "p")
    // interval spans many bins; the point's bin is unique so exactly one match row
    val intervals = Seq(("wide", 0.0, 10000.0)).toDF("name", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", binWidth = 8.0)
    assert(out.count() == 1)
  }

  test("negative values bin correctly (floor, not truncate-toward-zero)") {
    val points = Seq((1L, -5.0), (2L, -64.0), (3L, -0.1)).toDF("pid", "p")
    val intervals = Seq(("neg", -70.0, -1.0)).toDF("name", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", binWidth = 64.0)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L), s"got $got")
  }
}
