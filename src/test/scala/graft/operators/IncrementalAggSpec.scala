package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val k = 4

  private def mk(rows: Seq[(String, Long)]): DataFrame = rows.toDF("g", "h")

  private def canon(df: DataFrame): Set[(String, Long, Seq[Long])] =
    df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getSeq[Long](2).toList: Seq[Long])).toSet

  test("fold of per-batch states equals the single-batch state over the union") {
    val rnd = new scala.util.Random(3)
    val batches = Seq.fill(7)(Seq.fill(40)(
      (s"g${rnd.nextInt(3)}", rnd.nextInt(25).toLong)))
    val folded = IncrementalAgg.fold(
      batches.map(b => IncrementalAgg.state(mk(b), "g", "h", k)), "g", k)
    val direct = IncrementalAgg.state(mk(batches.flatten), "g", "h", k)
    assert(canon(folded) == canon(direct))
  }

  test("merge is associative: (a+b)+c == a+(b+c)") {
    val sts = Seq(
      Seq(("g", 1L), ("g", 2L), ("g", 9L)),
      Seq(("g", 2L), ("g", 7L)),
      Seq(("g", 3L), ("g", 8L), ("g", 1L))).map(b => IncrementalAgg.state(mk(b), "g", "h", k))
    val left = IncrementalAgg.merge(IncrementalAgg.merge(sts(0), sts(1), "g", k), sts(2), "g", k)
    val right = IncrementalAgg.merge(sts(0), IncrementalAgg.merge(sts(1), sts(2), "g", k), "g", k)
    assert(canon(left) == canon(right))
  }

  test("state keeps only the k smallest distinct hashes; counts keep every row") {
    val st = IncrementalAgg.state(
      mk(Seq(("g", 5L), ("g", 1L), ("g", 5L), ("g", 9L), ("g", 3L), ("g", 7L))), "g", "h", k)
    val row = st.collect().head
    assert(row.getLong(1) == 6L)
    assert(row.getSeq[Long](2).toList == List(1L, 3L, 5L, 7L))
  }

  test("estimate is exact below the fill point and positive beyond") {
    val small = IncrementalAgg.estimate(
      IncrementalAgg.state(mk(Seq(("g", 10L), ("g", 20L))), "g", "h", k), k)
    assert(small.collect().head.getDouble(3) == 2.0)
    val big = IncrementalAgg.estimate(
      IncrementalAgg.state(mk((1L to 100L).map(h => ("g", h * 1000000L))), "g", "h", k), k)
    assert(big.collect().head.getDouble(3) > 0.0)
  }
}
