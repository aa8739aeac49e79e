package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD2 merge specs.
  *
  * The events-merge golden test encodes the reference's own worked example
  * (/root/reference/examples/events-to-scd-type-2.png): 5 events for orders
  * 100/101 → exactly 3 version rows, closed version ends at the next
  * surviving event's time, open versions carry the 2999-12-31 sentinel.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val T = "2021-01-02 00:00:00" // batch ts for the golden day

  private def emptyOrdersDim: DataFrame =
    Seq.empty[(String, String, String, String, String, String)]
      .toDF("order_id", "status", "event_time", "processed_time", "start_time", "end_time")
      .select(col("order_id"), col("status"),
        col("event_time").cast("timestamp"),
        col("processed_time").cast("timestamp"),
        col("start_time").cast("timestamp"),
        col("end_time").cast("timestamp"))

  private def events(rows: (String, String, String)*): DataFrame =
    rows.toSeq.toDF("id", "status", "event_time")
      .withColumn("event_time", col("event_time").cast("timestamp"))
      .withColumn("tiebreak", col("status"))

  test("eventsMerge reproduces the reference PNG golden trace") {
    val evts = events(
      ("100", "CREATED",   "2021-01-01 10:00:00"),
      ("101", "CREATED",   "2021-01-01 10:01:00"),
      ("100", "CREATED",   "2021-01-01 11:00:00"),
      ("100", "CREATED",   "2021-01-01 12:00:00"),
      ("100", "COMPLETED", "2021-01-01 18:00:00"))

    val out = Scd2.eventsMerge(emptyOrdersDim, evts, T)
      .select(col("order_id"), col("status"),
        col("start_time").cast("string"), col("end_time").cast("string"))

    assertSameRows(out, Seq(
      Seq("100", "CREATED",   "2021-01-01 10:00:00", "2021-01-01 18:00:00"),
      Seq("101", "CREATED",   "2021-01-01 10:01:00", "2999-12-31 23:59:59"),
      Seq("100", "COMPLETED", "2021-01-01 18:00:00", "2999-12-31 23:59:59")))
  }

  test("eventsMerge closes a differing current dim row at batch time") {
    val dim = Seq(("100", "CREATED", "2021-01-01 10:00:00", "2021-01-01 00:00:00",
                   "2021-01-01 10:00:00", "2999-12-31 23:59:59"))
      .toDF("order_id", "status", "event_time", "processed_time", "start_time", "end_time")
      .select(col("order_id"), col("status"),
        col("event_time").cast("timestamp"), col("processed_time").cast("timestamp"),
        col("start_time").cast("timestamp"), col("end_time").cast("timestamp"))

    val out = Scd2.eventsMerge(dim, events(("100", "COMPLETED", "2021-01-02 09:00:00")), T)
      .select(col("order_id"), col("status"),
        col("start_time").cast("string"), col("end_time").cast("string"))

    assertSameRows(out, Seq(
      // pre-existing row closed at BATCH time (faithful quirk), not event time
      Seq("100", "CREATED",   "2021-01-01 10:00:00", T),
      Seq("100", "COMPLETED", "2021-01-02 09:00:00", "2999-12-31 23:59:59")))
  }

  test("eventsMerge A->B->A collapses to two versions (faithful quirk)") {
    val out = Scd2.eventsMerge(emptyOrdersDim, events(
      ("7", "A", "2021-01-01 01:00:00"),
      ("7", "B", "2021-01-01 02:00:00"),
      ("7", "A", "2021-01-01 03:00:00")), T)
    assert(out.count() == 2)
  }

  test("eventsMerge re-run of the same batch is a no-op (idempotence guard)") {
    val evts = events(("9", "CREATED", "2021-01-01 05:00:00"))
    val once = Scd2.eventsMerge(emptyOrdersDim, evts, T)
    val twice = Scd2.eventsMerge(once, evts, T)
    assert(twice.count() == once.count())
  }

  test("snapshotMerge versions changed attrs and inserts new ids") {
    val dim = Seq(
      ("1000", "disk", "office", 1230.1, "2019-01-01 00:00:00", "2019-01-01 00:00:00", "2999-12-31 23:59:59"),
      ("1001", "usb",  "office", 130.0,  "2019-01-01 00:00:00", "2019-01-01 00:00:00", "2999-12-31 23:59:59"))
      .toDF("id", "title", "category", "price", "processed_time", "start_time", "end_time")
      .withColumn("processed_time", col("processed_time").cast("timestamp"))
      .withColumn("start_time", col("start_time").cast("timestamp"))
      .withColumn("end_time", col("end_time").cast("timestamp"))

    // 1000 changed price; 1001 unchanged; 1002 brand-new.
    val stg = Seq(
      ("1000", "disk", "office", 999.0),
      ("1001", "usb",  "office", 130.0),
      ("1002", "mouse", "per", 200.0)).toDF("id", "title", "category", "price")

    val ts = "2019-01-02 00:00:00"
    val out = Scd2.snapshotMerge(dim, stg, Seq("title", "category", "price"), ts)
      .select(col("id"), col("price").cast("string"),
        col("start_time").cast("string"), col("end_time").cast("string"))

    assertSameRows(out, Seq(
      Seq("1000", "1230.1", "2019-01-01 00:00:00", ts),                    // closed
      Seq("1000", "999.0",  ts, "2999-12-31 23:59:59"),                    // new version
      Seq("1001", "130.0",  "2019-01-01 00:00:00", "2999-12-31 23:59:59"), // untouched
      Seq("1002", "200.0",  ts, "2999-12-31 23:59:59")))                   // brand-new
  }

  test("snapshotMerge is null-safe on attribute change (IS DISTINCT FROM)") {
    val dim = Seq(("1", Option.empty[String], "c", 1.0, "2019-01-01 00:00:00", "2019-01-01 00:00:00", "2999-12-31 23:59:59"))
      .toDF("id", "title", "category", "price", "processed_time", "start_time", "end_time")
      .withColumn("processed_time", col("processed_time").cast("timestamp"))
      .withColumn("start_time", col("start_time").cast("timestamp"))
      .withColumn("end_time", col("end_time").cast("timestamp"))
    val stg = Seq(("1", "now-set", "c", 1.0)).toDF("id", "title", "category", "price")
    val out = Scd2.snapshotMerge(dim, stg, Seq("title", "category", "price"), "2019-01-02 00:00:00")
    // NULL -> 'now-set' must be detected as a change: 1 closed + 1 new = 2 rows
    assert(out.count() == 2)
    assert(out.where(col("end_time") === to_timestamp(lit("2019-01-02 00:00:00"))).count() == 1)
  }

  test("snapshotMerge re-run with identical snapshot is a no-op") {
    val dim = emptyProductsDim
    val stg = Seq(("1", "t", "c", 1.0)).toDF("id", "title", "category", "price")
    val d1 = Scd2.snapshotMerge(dim, stg, Seq("title", "category", "price"), "2019-01-02 00:00:00")
    val d2 = Scd2.snapshotMerge(d1, stg, Seq("title", "category", "price"), "2019-01-03 00:00:00")
    assert(d2.count() == d1.count())
  }

  test("eventsMerge out-of-contract input: out-of-order later batch leaves two open versions (pinned)") {
    // INPUT CONTRACT (Scd2.eventsMerge scaladoc): batch N+1 events must
    // postdate the open version's start_time. This pins what happens when
    // that contract is violated — the close step skips (start_time <
    // evt_time guard, needed for replay idempotence) while the append
    // step still runs, so the id ends up with TWO open versions. Daily
    // file batches cannot produce this input; a future semantic change
    // here must be a conscious one.
    val d1 = Scd2.eventsMerge(emptyOrdersDim,
      events(("100", "CREATED", "2021-01-01 10:00:00")), T)
    val d2 = Scd2.eventsMerge(d1,
      events(("100", "COMPLETED", "2021-01-01 09:00:00")), "2021-01-03 00:00:00")
    val open = d2.where(col("end_time") === to_timestamp(lit(Scd2.Sentinel)))
    assert(open.count() == 2, "violated precondition is documented to leave two open versions")
  }

  private def emptyProductsDim: DataFrame =
    Seq.empty[(String, String, String, Double, String, String, String)]
      .toDF("id", "title", "category", "price", "processed_time", "start_time", "end_time")
      .withColumn("processed_time", col("processed_time").cast("timestamp"))
      .withColumn("start_time", col("start_time").cast("timestamp"))
      .withColumn("end_time", col("end_time").cast("timestamp"))
}
