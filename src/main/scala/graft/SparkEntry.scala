package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dims.DimDates
import graft.metrics.Metrics

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a DuckDB-runnable twin in [[oracleSql]]
  * with IDENTICAL column names and ORDER BY keys. Conventions that keep the
  * two engines hash-identical (see SURVEY.md §7.4):
  *  - timestamps are emitted as formatted strings (`yyyy-MM-dd HH:mm:ss.SSSSSS`
  *    vs strftime `%f`) — avoids tz-annotation mismatches in parquet;
  *  - money aggregations run in exact integer cents / DECIMAL, cast to DOUBLE
  *    at the very end — immune to FP summation order;
  *  - every hash is md5-derived (graft.functions.PortableHash);
  *  - every result ends in a total ORDER BY over a unique key set.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Metrics.ordersPerQuarter(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_dim_dates" -> ((s, _) => DimDates.build(s).orderBy("datum")),
    "q02_orders_per_quarter" -> ((s, d) => Metrics.ordersPerQuarter(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_dim_dates" ->
      """SELECT strftime(d, '%Y%m%d') AS id, d AS datum,
        |  CAST(dayofmonth(d) AS INT) AS day_of_month,
        |  CAST(dayofyear(d) AS INT) AS day_of_year,
        |  CAST(month(d) AS INT) AS month,
        |  CAST(quarter(d) AS INT) AS quarter,
        |  CAST(year(d) AS INT) AS year,
        |  CAST(date_trunc('month', d) AS DATE) AS first_day_of_month,
        |  last_day(d) AS last_day_of_month,
        |  CAST(date_trunc('month', d) + INTERVAL 1 MONTH AS DATE) AS first_day_of_next_month
        |FROM (SELECT CAST(r AS DATE) AS d
        |      FROM generate_series(DATE '1970-01-01', DATE '2049-12-31', INTERVAL 1 DAY) t(r))
        |ORDER BY datum""".stripMargin,
    "q02_orders_per_quarter" ->
      """SELECT CAST(year(o_orderdate) AS VARCHAR) || '_' || CAST(quarter(o_orderdate) AS VARCHAR)
        |    AS year_quarter,
        |  count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY year_quarter
        |ORDER BY year_quarter""".stripMargin,
  )
}
