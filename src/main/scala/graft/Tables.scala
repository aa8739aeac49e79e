package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * Every query receives `sfDir` (e.g. /root/testdata/sf0.01) and reads only
  * the tables it needs — Spark's parquet source then gets column pruning and
  * predicate pushdown for free, which is the behavior we want at 100 TB:
  * never materialize a table wider or earlier than the plan demands.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.parquet's `ts` physical type has changed across corpus
    * generations (TIMESTAMP(NANOS) read as INT64 under `nanosAsLong`;
    * later regenerations store TIMESTAMP(MICROS), which Spark reads as
    * TIMESTAMP_NTZ). Dispatch on the OBSERVED dtype so one upstream
    * re-type never takes out every event-reading query again:
    *  - INT64 nanos → floor-divide to micros (how DuckDB coerces ns→µs,
    *    so oracle timestamps agree);
    *  - TIMESTAMP / TIMESTAMP_NTZ → plain cast (session tz is UTC, so
    *    the NTZ local value and DuckDB's naive read denote the same
    *    instant). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => // TIMESTAMP_NTZ (or a future string/date drift)
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
