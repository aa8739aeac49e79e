package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** top_k_pairs must equal the rank-window formulation it replaces —
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, id) <= k` —
  * including ties (id tiebreak), ±0.0, NaN placement, and both the
  * single-partition and partial+merge execution shapes. Scores compare
  * via raw bits so NaN and −0.0 fidelity are part of the assertion. */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def canon(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
    (r.getString(0), r.getInt(1), r.getLong(2),
      java.lang.Double.doubleToRawLongBits(r.getDouble(3)))
  }.toSet

  private def compare(rows: Seq[(String, Long, Double)], k: Int, parts: Int): Unit = {
    val df = rows.toDF("g", "id", "score").repartition(parts)
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    val windowed = df.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("g"), col("rank"), col("id"), col("score")).collect()
    val agged = df.groupBy(col("g")).agg(expr(s"top_k_pairs(id, score, $k)").as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("r0", "p")))
      .select(col("g"), (col("r0") + 1).cast("int").as("rank"),
        col("p.id").as("id"), col("p.score").as("score")).collect()
    assert(canon(agged) == canon(windowed), s"parts=$parts k=$k")
  }

  test("top_k_pairs equals the rank window on random data with ties") {
    val rnd = new scala.util.Random(31)
    // small score domain forces ties → the id tiebreak is exercised
    val rows = Seq.fill(4000)((s"g${rnd.nextInt(9)}", rnd.nextInt(100000).toLong,
      rnd.nextInt(12).toDouble))
      .distinctBy(r => (r._1, r._2)) // contract: distinct ids per group
    for (parts <- Seq(1, 8); k <- Seq(1, 3, 16)) compare(rows, k, parts)
  }

  test("±0.0 tie on id; NaN ranks first; raw score bits survive") {
    val rows = Seq(
      ("g", 5L, 0.0), ("g", 3L, -0.0), ("g", 9L, Double.NaN),
      ("g", 1L, -1.5), ("g", 7L, 2.5))
    compare(rows, 4, 2)
    // explicit rank order: NaN, 2.5, then the ±0.0 tie broken by id (3 < 5)
    val got = rows.toDF("g", "id", "score")
      .groupBy(col("g")).agg(expr("top_k_pairs(id, score, 4)").as("tk"))
      .select(expr("transform(tk, p -> p.id)").as("ids")).as[Seq[Long]].head()
    assert(got == Seq(9L, 7L, 3L, 5L))
  }

  test("thin groups return fewer than k pairs; empty input none") {
    val rows = Seq(("a", 1L, 1.0), ("b", 2L, 2.0), ("b", 3L, 1.0))
    val got = rows.toDF("g", "id", "score")
      .groupBy(col("g")).agg(expr("top_k_pairs(id, score, 5)").as("tk"))
      .select(col("g"), size(col("tk")).as("n")).as[(String, Int)].collect().toMap
    assert(got == Map("a" -> 1, "b" -> 2))
  }
}
