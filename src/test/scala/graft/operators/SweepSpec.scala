package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class SweepSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def run(iv: Seq[(Timestamp, Timestamp)]): Map[Long, Long] =
    Sweep.concurrency(iv.toDF("st", "en"), "st", "en")
      .select("t", "concurrent").as[(Long, Long)].collect().toMap

  private def us(s: String): Long = ts(s).getTime * 1000L

  test("disjoint intervals never overlap: concurrency 1 at every boundary") {
    val got = run(Seq(
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")),
      (ts("2024-01-01 11:00:00"), ts("2024-01-01 11:10:00"))))
    assert(got.values.toSet == Set(1L))
  }

  test("nested and overlapping intervals count correctly") {
    val got = run(Seq(
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")),
      (ts("2024-01-01 10:10:00"), ts("2024-01-01 10:20:00")),
      (ts("2024-01-01 10:15:00"), ts("2024-01-01 10:40:00"))))
    assert(got(us("2024-01-01 10:00:00")) == 1L)
    assert(got(us("2024-01-01 10:10:00")) == 2L)
    assert(got(us("2024-01-01 10:15:00")) == 3L)
    assert(got(us("2024-01-01 10:20:00")) == 3L) // inclusive end still active
    assert(got(us("2024-01-01 10:30:00")) == 2L)
    assert(got(us("2024-01-01 10:40:00")) == 1L)
  }

  test("inclusive ends: an interval ending where another starts overlaps it") {
    val got = run(Seq(
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00"))))
    assert(got(us("2024-01-01 11:00:00")) == 2L)
  }

  test("point intervals (start == end) appear with their instant's count") {
    val got = run(Seq(
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00")),
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"))))
    assert(got(us("2024-01-01 10:00:00")) == 2L)
    assert(got(us("2024-01-01 10:05:00")) == 1L)
  }

  test("matches a naive sequential sweep on random intervals across bucket boundaries") {
    val rnd = new scala.util.Random(11)
    val base = us("2024-01-01 00:00:00")
    val iv = Seq.fill(200) {
      val a = base + rnd.nextInt(5 * 86400) * 1000000L // 5 days, second granularity
      val b = a + rnd.nextInt(7200) * 1000000L
      (new Timestamp(a / 1000L), new Timestamp(b / 1000L))
    }
    val got = run(iv)
    val bounds = iv.flatMap { case (a, b) => Seq(a.getTime * 1000L, b.getTime * 1000L) }.distinct
    val naive = bounds.map { t =>
      t -> iv.count { case (a, b) => a.getTime * 1000L <= t && t <= b.getTime * 1000L }.toLong
    }.toMap
    assert(got == naive)
  }
}
