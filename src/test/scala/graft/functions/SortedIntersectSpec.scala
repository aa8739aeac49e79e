package graft.functions

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.SparkSpec

class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  test("equals size(array_intersect) on sorted distinct arrays (randomized batch)") {
    val rng = new Random(7)
    val cases = (1 to 200).map { _ =>
      def arr() = Seq.fill(rng.nextInt(12))(rng.nextInt(40).toLong).distinct.sorted
      (arr(), arr())
    }
    val got = cases.toDF("a", "b")
      .select(expr("sorted_intersect_count(a, b)").as("fast"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .as[(Int, Int)].collect()
    got.zip(cases).foreach { case ((fast, ref), (a, b)) =>
      assert(fast == ref, s"a=$a b=$b")
    }
  }

  test("null input propagates null; empty arrays count zero") {
    val df = Seq((Some(Seq(1L, 2L)), None: Option[Seq[Long]]),
      (Some(Seq.empty[Long]), Some(Seq(1L, 2L))))
      .toDF("a", "b")
    val got = df.select(expr("sorted_intersect_count(a, b)").as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(got.toSeq == Seq(None, Some(0)))
  }

  test("null ELEMENT fails fast instead of returning a silently-wrong count") {
    // general SQL function, containsNull arrays admitted by the type
    // check — a null slot must be an error, not garbage from getLong
    val df = Seq((Seq(Some(1L), None, Some(3L)), Seq(Some(1L), Some(3L))))
      .toDF("a", "b")
    val e = intercept[Exception] {
      df.select(expr("sorted_intersect_count(a, b)")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("null array element")), s"got: $e")
  }

  test("interpreted eval matches codegen") {
    // force the interpreted path via eval on the expression directly
    val e = SortedIntersectCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1L, 3L, 5L, 9L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(2L, 3L, 4L, 5L, 10L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
    assert(e.eval(null) == 2)
  }
}
