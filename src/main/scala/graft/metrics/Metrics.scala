package graft.metrics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dims.DimDates

/** The reference's declared analytic queries (SURVEY.md §2.8, Q1–Q7),
  * re-expressed over the driver corpus (FIXTURES.md §B mapping).
  *
  * Scale posture: every join against `dim_dates` is an explicit
  * `broadcast()` (29,220 rows — never shuffle the fact side for it); all
  * aggregations are plain hash aggregates with map-side partials. "now()"
  * from the reference SQL (postgresql.md:106,143,144) is injected as a
  * literal `asOf` so runs are deterministic and oracle-comparable.
  */
object Metrics {

  /** Q2 (README.md:46, postgresql.md:112-120): orders created per quarter,
    * two-year window. J1 broadcast equi-join on the computed date key + A2
    * group-count; label `year_quarter` matches the reference's
    * `year || '_' || quarter` concat (postgresql.md:114).
    */
  def ordersPerQuarter(spark: SparkSession, sfDir: String,
                       from: String = "1997-01-01", until: String = "1999-01-01"): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= to_timestamp(lit(from)) &&
             col("o_orderdate") <  to_timestamp(lit(until)))
    val dates = DimDates.build(spark)
    orders.join(broadcast(dates), to_date(col("o_orderdate")) === dates("datum"))
      .groupBy(concat(col("year").cast("string"), lit("_"), col("quarter").cast("string"))
        .as("year_quarter"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("year_quarter")
  }
}
