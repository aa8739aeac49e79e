package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def dim = Seq(
    ("p1", "X", "2019-01-01 00:00:00", "2019-06-01 00:00:00"),
    ("p1", "Y", "2019-06-01 00:00:00", "2999-12-31 23:59:59"),
    ("p2", "Z", "2019-03-01 00:00:00", "2999-12-31 23:59:59"))
    .toDF("id", "category", "start_time", "end_time")
    .withColumn("start_time", col("start_time").cast("timestamp"))
    .withColumn("end_time", col("end_time").cast("timestamp"))

  test("each fact row picks the version valid at its event time (half-open)") {
    val facts = Seq(
      ("f1", "p1", "2019-02-15 12:00:00"), // inside v1
      ("f2", "p1", "2019-06-01 00:00:00"), // exactly at boundary → v2 (half-open)
      ("f3", "p1", "2019-08-01 00:00:00"), // inside v2
      ("f4", "p2", "2019-01-01 00:00:00")) // before p2's first version → dropped
      .toDF("fact_id", "key", "t").withColumn("t", col("t").cast("timestamp"))

    val out = AsOfJoin(facts, dim, "key", "id", facts("t"))
      .select("fact_id", "category").as[(String, String)].collect().toMap
    assert(out == Map("f1" -> "X", "f2" -> "Y", "f3" -> "Y"))
  }

  test("left join keeps unmatched facts; currentAt reads the open versions") {
    val facts = Seq(("f4", "p2", "2019-01-01 00:00:00"))
      .toDF("fact_id", "key", "t").withColumn("t", col("t").cast("timestamp"))
    val left = AsOfJoin(facts, dim, "key", "id", facts("t"), joinType = "left")
    assert(left.count() == 1 && left.where(col("category").isNull).count() == 1)

    val current = AsOfJoin.currentAt(dim, "2019-07-01 00:00:00")
      .select("id", "category").as[(String, String)].collect().toSet
    assert(current == Set(("p1", "Y"), ("p2", "Z")))
  }
}
