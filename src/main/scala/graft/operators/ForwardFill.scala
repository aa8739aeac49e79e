package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forward-fill (last-observation-carried-forward) over a dense date
  * scaffold — the operator behind the reference's inventory metrics
  * (README.md:63-65, SURVEY.md §2.10/W5): snapshots are sparse ("only
  * products whose stock changed appear"), so "stock per category per day"
  * needs every (entity, day) cell filled with the last known value.
  *
  * Semantics: for each entity and scaffold day D, value = the latest
  * snapshot with snapshot_date <= D (within a day, the latest by
  * (event_time, tiebreak)); entities with no snapshot on or before D
  * contribute nothing (SURVEY.md §7.4.1).
  *
  * Scale: the scaffold is entities × days — built by cross-joining the
  * (small, broadcast) day range onto the DISTINCT entity set, so the
  * blow-up factor is bounded by the window length, not data size. The fill
  * itself is one window per entity (single shuffle on entity), using
  * `last(ignoreNulls)` with an unbounded-preceding row frame.
  */
object ForwardFill {
  /** snapshots columns: entity, snap_date (date), value, tiebreak.
    * days: single-column `datum` date scaffold (broadcast-sized).
    * Returns (entity, datum, value) with value forward-filled, rows with
    * no value yet dropped. */
  def fill(snapshots: DataFrame, days: DataFrame): DataFrame = {
    // Collapse to one snapshot per (entity, day): the latest within the day.
    val byEntityDay = Window.partitionBy(col("entity"), col("snap_date"))
      .orderBy(col("tiebreak").desc)
    val daily = snapshots
      .withColumn("rn", row_number().over(byEntityDay)).where(col("rn") === 1)
      .select(col("entity"), col("snap_date"), col("value"))

    val scaffold = snapshots.select(col("entity")).distinct()
      .crossJoin(broadcast(days))
    val filled = scaffold
      .join(daily, col("datum") === col("snap_date") && scaffold("entity") === daily("entity"), "left")
      .select(scaffold("entity"), col("datum"), col("value"))
      .withColumn("value",
        last(col("value"), ignoreNulls = true).over(
          Window.partitionBy(col("entity")).orderBy(col("datum"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    filled.where(col("value").isNotNull)
  }
}
