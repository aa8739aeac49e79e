package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ForwardFillSpec extends SparkSpec {
  import spark.implicits._

  test("fill carries last-known value forward across missing days") {
    val snaps = Seq(
      ("p1", "2019-01-01", 100.0, 1),
      ("p1", "2019-01-03", 50.0, 1),
      ("p2", "2019-01-02", 7.0, 1))
      .toDF("entity", "snap_date", "value", "tiebreak")
      .withColumn("snap_date", col("snap_date").cast("date"))

    val days = Seq("2019-01-01", "2019-01-02", "2019-01-03", "2019-01-04")
      .toDF("datum").withColumn("datum", col("datum").cast("date"))

    val out = ForwardFill.fill(snaps, days)
      .select(col("entity"), col("datum").cast("string"), col("value").cast("string"))

    assertSameRows(out, Seq(
      Seq("p1", "2019-01-01", "100.0"),
      Seq("p1", "2019-01-02", "100.0"), // carried
      Seq("p1", "2019-01-03", "50.0"),
      Seq("p1", "2019-01-04", "50.0"),  // carried
      // p2 contributes nothing before its first snapshot (SURVEY.md §7.4.1)
      Seq("p2", "2019-01-02", "7.0"),
      Seq("p2", "2019-01-03", "7.0"),
      Seq("p2", "2019-01-04", "7.0")))
  }

  test("within-day duplicates resolve to the latest by tiebreak") {
    val snaps = Seq(
      ("p1", "2019-01-01", 1.0, 1),
      ("p1", "2019-01-01", 2.0, 2)) // higher tiebreak wins
      .toDF("entity", "snap_date", "value", "tiebreak")
      .withColumn("snap_date", col("snap_date").cast("date"))
    val days = Seq("2019-01-01").toDF("datum").withColumn("datum", col("datum").cast("date"))
    val out = ForwardFill.fill(snaps, days)
    assert(out.head().getDouble(2) == 2.0)
  }
}
