package graft.operators

import graft.SparkSpec
import graft.dims.DimDates
import org.apache.spark.sql.functions._

class FactBuildSpec extends SparkSpec {
  import spark.implicits._

  test("firstEventFacts is invariant to input row order (deterministic tiebreaks)") {
    val rows = (1 to 200).map(i =>
      (s"k${i % 20}", f"2020-05-${i % 28 + 1}%02d 10:00:00", i.toLong, i * 1.5))
    def facts(seq: Seq[(String, String, Long, Double)]) = {
      val df = seq.toDF("key", "event_time", "tiebreak", "total_price")
        .withColumn("event_time", col("event_time").cast("timestamp"))
      rowsOf(FactBuild.firstEventFacts(df, DimDates.build(spark)))
    }
    assert(facts(rows) == facts(scala.util.Random.shuffle(rows)))
  }

  test("firstEventFacts keeps the earliest event per key with its date surrogate") {
    val events = Seq(
      ("20211003", "2020-05-23 11:30:00", "b", 132.0), // later same day
      ("20211003", "2020-05-23 11:10:00", "a", 130.0), // first → wins
      ("20181000", "2018-05-23 10:10:01", "a", 3230.0))
      .toDF("key", "event_time", "tiebreak", "total_price")
      .withColumn("event_time", col("event_time").cast("timestamp"))

    val out = FactBuild.firstEventFacts(events, DimDates.build(spark))
      .select(col("key"), col("created_date_id"),
        col("created_time").cast("string"), col("total_price").cast("string"))

    assertSameRows(out, Seq(
      Seq("20211003", "20200523", "2020-05-23 11:10:00", "130.0"),
      Seq("20181000", "20180523", "2018-05-23 10:10:01", "3230.0")))
  }
}
