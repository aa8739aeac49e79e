package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-day replay of the full DAG over reference-sample-shaped inputs
  * (FIXTURES.md §A), asserting SCD2 invariants after each day and
  * idempotence of a re-run (Airflow catchup / retry semantics). */
class ProcessOrdersSpec extends SparkSpec {
  import spark.implicits._

  private val Sentinel = "2999-12-31 23:59:59"

  private def products(rows: (String, String, String, Double)*): DataFrame =
    rows.toDF("id", "title", "category", "price")

  private def orders(rows: (String, String, Double, Double, String, String)*): DataFrame =
    rows.toDF("id", "product_id", "amount", "total_price", "status", "event_time")
      .withColumn("event_time", col("event_time").cast("timestamp"))

  private def scdInvariants(dim: DataFrame, key: String): Unit = {
    // exactly one open (sentinel) version per key
    val open = dim.where(col("end_time") === to_timestamp(lit(Sentinel)))
      .groupBy(col(key)).count().where(col("count") =!= 1).count()
    assert(open == 0, s"every $key must have exactly one open version")
    // half-open intervals never invert
    assert(dim.where(col("start_time") >= col("end_time")).count() == 0)
  }

  test("two-day replay builds correct versions; re-running a day is a no-op") {
    val day1p = products(("p1", "widget", "X", 10.0), ("p2", "gadget", "Y", 5.0))
    val day2p = products(("p1", "widget", "Z", 10.0), ("p2", "gadget", "Y", 5.0)) // p1 category change
    val day1o = orders(
      ("100", "p1", 1.0, 10.0, "created", "2019-01-01 09:00:00"),
      ("101", "p2", 2.0, 10.0, "created", "2019-01-01 09:30:00"))
    val day2o = orders(
      ("100", "p1", 1.0, 10.0, "completed", "2019-01-02 11:00:00"),
      ("101", "p2", 2.0, 10.0, "deleted", "2019-01-02 12:00:00"))

    val s0 = ProcessOrders.emptyState(spark, day1p, day1o)
    val s2 = ProcessOrders.replay(spark, s0, Seq(
      (day1p, day1o, "2019-01-01 00:00:00"),
      (day2p, day2o, "2019-01-02 00:00:00")))

    // dim_products: p1 closed at batch-2 ts with a new Z version; p2 single
    val p = s2.dimProducts.select(col("id"), col("category"),
        col("start_time").cast("string"), col("end_time").cast("string"))
      .as[(String, String, String, String)].collect().toSet
    assert(p == Set(
      ("p1", "X", "2019-01-01 00:00:00", "2019-01-02 00:00:00"),
      ("p1", "Z", "2019-01-02 00:00:00", Sentinel),
      ("p2", "Y", "2019-01-01 00:00:00", Sentinel)))
    scdInvariants(s2.dimProducts, "id")

    // dim_orders: day-1 versions closed AT BATCH TIME (faithful quirk,
    // process_orders_sqls.py:104), day-2 versions open
    val o = s2.dimOrders.select(col("order_id"), col("status"),
        col("start_time").cast("string"), col("end_time").cast("string"))
      .as[(String, String, String, String)].collect().toSet
    assert(o == Set(
      ("100", "created", "2019-01-01 09:00:00", "2019-01-02 00:00:00"),
      ("100", "completed", "2019-01-02 11:00:00", Sentinel),
      ("101", "created", "2019-01-01 09:30:00", "2019-01-02 00:00:00"),
      ("101", "deleted", "2019-01-02 12:00:00", Sentinel)))
    scdInvariants(s2.dimOrders, "order_id")

    // fact: first event ever per order (day-1 created rows), never updated
    val f = s2.factOrders.select(col("order_id"), col("created_date_id"),
        col("created_time").cast("string")).as[(String, String, String)].collect().toSet
    assert(f == Set(
      ("100", "20190101", "2019-01-01 09:00:00"),
      ("101", "20190101", "2019-01-01 09:30:00")))

    // idempotence: re-running day 2 changes nothing
    val s2again = ProcessOrders.runDay(spark, s2, day2p, day2o, "2019-01-02 00:00:00")
    assert(rowsOf(s2again.dimProducts) == rowsOf(s2.dimProducts))
    assert(rowsOf(s2again.dimOrders) == rowsOf(s2.dimOrders))
    assert(rowsOf(s2again.factOrders) == rowsOf(s2.factOrders))
  }

  test("production shape: state parquet-materialized between days via overwriteSwap") {
    import graft.sources.Ingest
    val base = java.nio.file.Files.createTempDirectory("graft_wh").toString
    def load(name: String) = spark.read.parquet(s"$base/$name")
    def store(df: org.apache.spark.sql.DataFrame, name: String) =
      Ingest.overwriteSwap(spark, df, s"$base/$name")

    val day1p = products(("p1", "widget", "X", 10.0))
    val day2p = products(("p1", "widget", "Z", 10.0))
    val day1o = orders(("100", "p1", 1.0, 10.0, "created", "2019-01-01 09:00:00"))
    val day2o = orders(("100", "p1", 1.0, 10.0, "completed", "2019-01-02 11:00:00"))

    val s0 = ProcessOrders.emptyState(spark, day1p, day1o)
    val s1 = ProcessOrders.runDay(spark, s0, day1p, day1o, "2019-01-01 00:00:00")
    store(s1.dimProducts, "dim_products"); store(s1.dimOrders, "dim_orders")
    store(s1.factOrders, "fact_orders")

    // day 2 reads yesterday's parquet — the swap means the read path
    // never overlaps the rewrite
    val s1FromDisk = ProcessOrders.WarehouseState(
      load("dim_products"), load("dim_orders"), load("fact_orders"))
    val s2 = ProcessOrders.runDay(spark, s1FromDisk, day2p, day2o, "2019-01-02 00:00:00")
    store(s2.dimProducts, "dim_products"); store(s2.dimOrders, "dim_orders")
    store(s2.factOrders, "fact_orders")

    val o = load("dim_orders").select(col("order_id"), col("status"),
        col("start_time").cast("string"), col("end_time").cast("string"))
      .as[(String, String, String, String)].collect().toSet
    assert(o == Set(
      ("100", "created", "2019-01-01 09:00:00", "2019-01-02 00:00:00"),
      ("100", "completed", "2019-01-02 11:00:00", Sentinel)))
    assert(load("dim_products").count() == 2 && load("fact_orders").count() == 1)
  }
}
