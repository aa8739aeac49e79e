package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** FACT-BUILD (fact_orders_created) — process_orders_sqls.py:135-147.
  *
  * All staging events are joined to the date dimension on the event date and
  * projected with the surrogate `created_date_id`; `ON CONFLICT(order_id)
  * DO NOTHING` keeps the first row ever inserted per order. Postgres leaves
  * in-batch insert order engine-defined; we define it deterministically:
  * first event per key by (event_time, tiebreak) via row_number (SURVEY.md
  * §2.6 FACT-BUILD).
  *
  * Scale: the date dim (29k rows) is broadcast — the fact side never
  * shuffles for the join; the first-wins window shuffles once on the fact
  * key, which an anti-join against existing keys (Ingest.appendIfAbsent)
  * reuses.
  */
object FactBuild {
  /** events columns: key, event_time, payload... (plus an optional
    * `tiebreak` column — synthesized as a deterministic row hash when
    * absent, mirroring Scd2.eventsMerge).
    * dimDates columns: id (yyyyMMdd), datum.
    * Returns one row per key: payload + created_date_id + created_time. */
  def firstEventFacts(events0: DataFrame, dimDates: DataFrame): DataFrame = {
    val events = Tiebreak.ensure(events0)
    val w = Window.partitionBy(col("key")).orderBy(col("event_time"), col("tiebreak"))
    val first = events.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
    val dates = dimDates.select(col("id").as("created_date_id"), col("datum"))
    first.join(broadcast(dates), to_date(col("event_time")) === col("datum"))
      .drop("datum")
      .withColumn("created_time", col("event_time"))
  }
}
