package graft.dims

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Calendar (time) dimension generator.
  *
  * Reference: /root/reference/examples/create_dim_dates.py:33-49 — a
  * GENERATE_SERIES(0, 29219) row generator projected into per-day calendar
  * attributes (id yyyymmdd, day-of-month/year, month, quarter, year,
  * first/last day of month, first day of next month), inserted idempotently.
  *
  * Spark-first: `spark.range` is a parallel, shuffle-free generator; every
  * derived column is a built-in codegen'd date function. 29,220 rows — this
  * dimension is always broadcast-joined (it is the canonical small dim even
  * at 100 TB fact scale).
  */
object DimDates {
  val Epoch = "1970-01-01"
  val Days  = 29220L // 1970-01-01 .. 2049-12-31, matches GENERATE_SERIES(0,29219)

  def build(spark: SparkSession, start: String = Epoch, days: Long = Days): DataFrame = {
    val d = to_date(lit(start))
    spark.range(0, days)
      .withColumn("datum", date_add(d, col("id").cast("int")))
      .select(
        date_format(col("datum"), "yyyyMMdd").as("id"),
        col("datum"),
        dayofmonth(col("datum")).as("day_of_month"),
        dayofyear(col("datum")).as("day_of_year"),
        month(col("datum")).as("month"),
        quarter(col("datum")).as("quarter"),
        year(col("datum")).as("year"),
        trunc(col("datum"), "month").as("first_day_of_month"),
        last_day(col("datum")).as("last_day_of_month"),
        add_months(trunc(col("datum"), "month"), 1).as("first_day_of_next_month"))
  }
}
