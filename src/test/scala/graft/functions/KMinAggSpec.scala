package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bounded k-min aggregate must be bit-equal to the unbounded
  * collect_set formulation it replaces — same distinct, same sort, same
  * truncation, same null handling — across random data, many groups,
  * and both the single-partition and many-partition (partial + final
  * merge) execution shapes. */
class KMinAggSpec extends SparkSpec {
  import spark.implicits._

  private def both(rows: Seq[(String, java.lang.Long)], k: Int, parts: Int) = {
    val df = rows.toDF("g", "h").repartition(parts)
    val bounded = df.groupBy(col("g")).agg(expr(s"k_min(h, $k)").as("hs"))
    val reference = df.groupBy(col("g"))
      .agg(expr(s"slice(array_sort(collect_set(h)), 1, $k)").as("hs"))
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    (canon(bounded), canon(reference))
  }

  test("k_min equals slice(array_sort(collect_set)) on random data") {
    val rnd = new scala.util.Random(11)
    val rows: Seq[(String, java.lang.Long)] = Seq.fill(3000)(
      (s"g${rnd.nextInt(7)}", java.lang.Long.valueOf(rnd.nextInt(200).toLong)))
    for (parts <- Seq(1, 8)) {
      val (got, want) = both(rows, 16, parts)
      assert(got == want, s"parts=$parts")
    }
  }

  test("k_min skips nulls, handles thin groups and negative hashes") {
    val rows: Seq[(String, java.lang.Long)] = Seq(
      ("a", java.lang.Long.valueOf(5L)), ("a", null), ("a", java.lang.Long.valueOf(-3L)),
      ("b", null), ("c", java.lang.Long.valueOf(Long.MaxValue)),
      ("c", java.lang.Long.valueOf(Long.MinValue)), ("c", java.lang.Long.valueOf(0L)))
    val (got, want) = both(rows, 2, 3)
    assert(got == want)
    assert(got("a") == List(-3L, 5L))
    assert(got("b") == Nil) // all-null group: empty sketch, not null
    assert(got("c") == List(Long.MinValue, 0L))
  }

  test("k_min state is capped: duplicates at the boundary do not evict") {
    // regression shape: buffer full at {1,2}, inserting an existing 1
    // must not evict 2 (TreeSet.add returns false on duplicates)
    val rows: Seq[(String, java.lang.Long)] = Seq(
      ("g", java.lang.Long.valueOf(2L)), ("g", java.lang.Long.valueOf(1L)),
      ("g", java.lang.Long.valueOf(1L)), ("g", java.lang.Long.valueOf(3L)))
    val (got, want) = both(rows, 2, 1)
    assert(got == want && got("g") == List(1L, 2L))
  }
}
