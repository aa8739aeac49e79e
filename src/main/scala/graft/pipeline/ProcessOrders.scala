package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dims.DimDates
import graft.operators.{FactBuild, Scd2}
import graft.sources.Ingest
import graft.warehouse.Warehouse

/** End-to-end daily batch replicating the reference DAG topology
  * (examples/process_orders.py:54,68,115,123,131):
  *
  *   products branch: file ready (S1) → stamp (S2) → stage (S3/S5) →
  *     SCD2-SNAPSHOT merge → dim_products
  *   orders branch:   file ready → stamp → stage → SCD2-EVENTS merge →
  *     dim_orders; staged events → FACT-BUILD → idempotent append (S7)
  *     → fact_orders_created
  *
  * The branches are independent subgraphs (the Airflow fan-out at
  * process_orders.py:115) — in Spark, two independent lazy plans.
  * Airflow catchup over consecutive days = folding [[runDay]] over
  * (ds, ts) batches; re-running a day is a no-op (idempotence guards in
  * Scd2.eventsMerge and Ingest.appendIfAbsent).
  *
  * Input schemas follow the reference sample data (FIXTURES.md §A):
  *  - products: id, title, category, price        (full daily snapshot)
  *  - orders:   id, product_id, amount, total_price, status, event_time
  *              (daily increment; (id, event_time) unique)
  */
object ProcessOrders {

  /** The mutable warehouse between batches. In production each frame is
    * parquet materialized via Ingest.overwriteSwap after every day; the
    * fold itself is identical. */
  case class WarehouseState(dimProducts: DataFrame, dimOrders: DataFrame, factOrders: DataFrame)

  val ProductAttrs: Seq[String] = Seq("title", "category", "price")

  private val scdCols = Seq(
    StructField("start_time", TimestampType),
    StructField("end_time", TimestampType),
    StructField("processed_time", TimestampType))

  /** Empty warehouse typed off the day-1 input schemas. */
  def emptyState(spark: SparkSession, products: DataFrame, orders: DataFrame): WarehouseState = {
    val dimProducts = Warehouse.emptyDim(spark,
      StructType(products.schema.fields ++ scdCols))
    val idType = orders.schema("id").dataType
    val dimOrders = Warehouse.emptyDim(spark, StructType(Seq(
      StructField("order_id", idType),
      StructField("status", StringType),
      StructField("event_time", TimestampType),
      StructField("processed_time", TimestampType)) ++ scdCols.take(2)))
    val factOrders = Warehouse.emptyDim(spark, StructType(Seq(
      StructField("order_id", idType),
      StructField("product_id", orders.schema("product_id").dataType),
      StructField("created_date_id", StringType),
      StructField("created_time", TimestampType),
      StructField("amount", orders.schema("amount").dataType),
      StructField("total_price", orders.schema("total_price").dataType),
      StructField("processed_time", TimestampType))))
    WarehouseState(dimProducts, dimOrders, factOrders)
  }

  /** One daily batch. `ts` is the batch timestamp (Airflow {{ ts }}). */
  def runDay(spark: SparkSession, state: WarehouseState,
             products: DataFrame, orders: DataFrame, ts: String): WarehouseState = {
    // ---- products branch ----
    val dimProducts = Scd2.snapshotMerge(state.dimProducts, products, ProductAttrs, ts)

    // ---- orders branch ----
    val events = orders.select(col("id"), col("status"), col("event_time"))
    val dimOrders = Scd2.eventsMerge(state.dimOrders, events, ts)

    val dates = DimDates.build(spark)
    val facts = FactBuild.firstEventFacts(
        orders.select(col("id").as("key"), col("event_time"),
          col("product_id"), col("amount"), col("total_price")),
        dates)
      .select(col("key").as("order_id"), col("product_id"), col("created_date_id"),
        col("created_time"), col("amount"), col("total_price"),
        to_timestamp(lit(ts)).as("processed_time"))
    val factOrders = state.factOrders.unionByName(
      Ingest.appendIfAbsent(facts, state.factOrders, Seq("order_id")))

    WarehouseState(dimProducts, dimOrders, factOrders)
  }

  /** Catchup: fold consecutive batches in date order
    * (docs/cheat-sheets/airflow.md backfill semantics). */
  def replay(spark: SparkSession, state: WarehouseState,
             batches: Seq[(DataFrame, DataFrame, String)]): WarehouseState =
    batches.foldLeft(state) { case (st, (p, o, ts)) => runDay(spark, st, p, o, ts) }
}
