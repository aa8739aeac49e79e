package graft.warehouse

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.dims.DimDates
import graft.operators.{FactBuild, Scd2}

/** Corpus-backed warehouse construction: the reference's dim/fact tables
  * (SURVEY.md §1.3) materialized from the driver corpus (FIXTURES.md §B).
  *
  * Mapping: `events` plays the order-event stream
  * (/root/reference/README.md:29-39) with user_id→order id,
  * event_type→status, ts→event time, event_id→tiebreak; `part` plays the
  * product snapshot (README.md:18-27) with p_type→category,
  * p_retailprice→price. A second synthetic product snapshot
  * (deterministic: every 5th part changes category and price) drives real
  * SCD2 version chains so the as-of joins (J2) have multiple versions to
  * choose between at different event times.
  *
  * Scale posture: dims are bounded by entity cardinality (users/parts),
  * never by fact size. In production each merge's output is materialized
  * (Ingest.overwriteSwap) before the next batch; here the two product
  * batches are chained lazily because the dim is tiny — the recipe is the
  * same either way.
  */
object Warehouse {
  /** Batch ts for the events merge — after the last corpus event. */
  val OrdersBatchTs = "2025-01-01 00:00:00"
  /** Product snapshot batches: v1 before lineitem history, v2 mid-history
    * so `l_shipdate` straddles the version boundary. */
  val PartsBatch1 = "1995-01-01 00:00:00"
  val PartsBatch2 = "1998-01-01 00:00:00"

  val ordersDimSchema: StructType = StructType(Seq(
    StructField("order_id", LongType),
    StructField("status", StringType),
    StructField("event_time", TimestampType),
    StructField("processed_time", TimestampType),
    StructField("start_time", TimestampType),
    StructField("end_time", TimestampType)))

  val partsDimSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("category", StringType),
    StructField("price", DoubleType),
    StructField("start_time", TimestampType),
    StructField("end_time", TimestampType),
    StructField("processed_time", TimestampType)))

  def emptyDim(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** dim_orders (process_orders_sqls.py:67-77) via SCD2-EVENTS over the
    * corpus event stream. */
  def dimOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select(
      col("user_id").as("id"),
      col("event_type").as("status"),
      col("ts").as("event_time"),
      col("event_id").as("tiebreak"))
    Scd2.eventsMerge(emptyDim(spark, ordersDimSchema), ev, OrdersBatchTs)
  }

  /** First (v1) product snapshot: `part` as-is. */
  def partsSnapshot1(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir).select(
      col("p_partkey").as("id"),
      col("p_type").as("category"),
      col("p_retailprice").as("price"))

  /** Second (v2) snapshot: every 5th part gets a new category suffix and a
    * +1.0 price bump (exact in binary FP — oracle-reproducible). */
  def partsSnapshot2(spark: SparkSession, sfDir: String): DataFrame = {
    val chg = col("id") % 5 === 0
    partsSnapshot1(spark, sfDir)
      .withColumn("category", when(chg, concat(col("category"), lit("_V2"))).otherwise(col("category")))
      .withColumn("price", when(chg, col("price") + lit(1.0)).otherwise(col("price")))
  }

  /** dim_products (process_orders_sqls.py:15-26) via two chained
    * SCD2-SNAPSHOT merges: changed parts carry [v1: 1995→1998) and
    * [v2: 1998→sentinel), unchanged parts a single open version. */
  def dimParts(spark: SparkSession, sfDir: String): DataFrame = {
    val d1 = Scd2.snapshotMerge(
      emptyDim(spark, partsDimSchema), partsSnapshot1(spark, sfDir),
      Seq("category", "price"), PartsBatch1)
    // Materialize between batches, as production does with a parquet
    // swap (Ingest.overwriteSwap): merge N+1 probes its input dim three
    // times, and chaining lazily compounds that into an exponentially
    // duplicated join tree (a 291-node plan before this persist).
    Scd2.snapshotMerge(d1.persist(), partsSnapshot2(spark, sfDir),
      Seq("category", "price"), PartsBatch2)
  }

  /** The corpus event stream split at mid-month. */
  val BatchSplit = "2024-01-16 00:00:00"
  val Batch1Ts = "2024-01-16 00:00:00"
  val Batch2Ts = "2024-02-01 00:00:00"

  /** dim_orders built by TWO chained SCD2-EVENTS merges (the corpus
    * stream split at [[BatchSplit]]) — the multi-day pipeline shape:
    * batch 2's earliest event per id closes batch 1's open version AT
    * BATCH TIME (the reference quirk), then batch 2's own version chain
    * appends. Materialized between batches like [[dimParts]]. */
  def dimOrdersTwoBatches(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select(
      col("user_id").as("id"),
      col("event_type").as("status"),
      col("ts").as("event_time"),
      col("event_id").as("tiebreak"))
    val split = to_timestamp(lit(BatchSplit))
    val d1 = Scd2.eventsMerge(
      emptyDim(spark, ordersDimSchema), ev.where(col("event_time") < split), Batch1Ts)
    Scd2.eventsMerge(d1.persist(), ev.where(col("event_time") >= split), Batch2Ts)
  }

  /** fact_orders_created (process_orders_sqls.py:79-90): the first event
    * per order joined to the date dimension for the surrogate key. */
  def factOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select(
      col("user_id").as("key"),
      col("ts").as("event_time"),
      col("event_id").as("tiebreak"),
      col("event_type").as("first_status"),
      col("value"))
    FactBuild.firstEventFacts(ev, DimDates.build(spark)).select(
      col("key").as("order_id"),
      col("created_date_id"),
      col("created_time"),
      col("first_status"),
      col("value"))
  }
}
