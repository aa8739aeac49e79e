package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** Property: the binned range join equals the cross-join reference for
  * ANY point/interval/binWidth shape — including intervals narrower
  * than, equal to, and much wider than the bin, bin-edge values, and
  * negative coordinates. Seeded for reproducibility. */
class RangeJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val caseGen: Gen[(List[Double], List[(Double, Double)], Double)] = for {
    nPts <- Gen.choose(1, 40)
    pts <- Gen.listOfN(nPts, Gen.chooseNum(-500.0, 500.0))
    nIv <- Gen.choose(1, 15)
    ivs <- Gen.listOfN(nIv, for {
      lo <- Gen.chooseNum(-500.0, 500.0)
      span <- Gen.chooseNum(0.0, 300.0)
    } yield (lo, lo + span))
    w <- Gen.oneOf(1.0, 7.5, 64.0, 1000.0)
  } yield (pts, ivs, w)

  test("property: binned join == cross-join reference for any inputs and bin width") {
    val prop = Prop.forAllNoShrink(caseGen) { case (pts, ivs, w) =>
      val points = pts.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
      val intervals = ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("iid", "lo", "hi")
      val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val ref = points.crossJoin(intervals)
        .where(col("p") >= col("lo") && col("p") <= col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      got == ref
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withInitialSeed(Seed(7L)), prop)
    assert(res.passed, res.status.toString)
  }
}
