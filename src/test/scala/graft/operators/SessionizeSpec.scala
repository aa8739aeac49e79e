package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap over threshold starts a new session; boundary-exact at the gap") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:29:59"), 2L), // 29:59 gap — same session
      (1L, ts("2024-01-01 10:59:59"), 3L), // exactly 30:00 gap — same session (strict >)
      (1L, ts("2024-01-01 11:30:00"), 4L), // 30:01 gap — new session
      (2L, ts("2024-01-01 00:00:00"), 5L)).toDF("user_id", "ts", "event_id")
    val got = Sessionize.byGap(ev)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == Map((1L, 1L) -> 3L, (1L, 2L) -> 1L, (2L, 1L) -> 1L))
  }

  test("session start/end span the member events") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:10:00"), 2L)).toDF("user_id", "ts", "event_id")
    val r = Sessionize.byGap(ev).collect().head
    assert(r.getString(3) == "2024-01-01 10:00:00.000000")
    assert(r.getString(4) == "2024-01-01 10:10:00.000000")
  }
}
