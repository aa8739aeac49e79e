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
  * snapshot assigned to a slot <= D. Callers map each snapshot to its
  * scaffold slot (`snap_date`) BEFORE calling — e.g. clamp pre-window
  * snapshots to the first scaffold day, or roll daily snapshots up to
  * month-ends — so the scaffold never needs to extend back to the first
  * snapshot in history. Within a slot the winner is the row with the
  * highest `tiebreaks` tuple (descending lexicographic); include the
  * original snapshot date as the first tiebreak so "latest observation
  * wins" survives the slot mapping. Entities with no snapshot on or
  * before D contribute nothing (SURVEY.md §7.4.1).
  *
  * Scale: the scaffold is entities × scaffold-days — built by
  * cross-joining the (small, broadcast) slot list onto the DISTINCT
  * entity set, so the blow-up is bounded by the window length, not by
  * history size. The fill itself is one window per entity (single
  * shuffle on entity) using `last(ignoreNulls)` over an
  * unbounded-preceding row frame.
  */
object ForwardFill {
  /** snapshots columns: entity, snap_date (slot date), value, tiebreaks...
    * days: single-column `datum` date scaffold (broadcast-sized).
    * Returns (entity, datum, value) with value forward-filled; rows with
    * no value yet are dropped. */
  def fill(snapshots: DataFrame, days: DataFrame,
           tiebreaks: Seq[String] = Seq("tiebreak")): DataFrame = {
    // Collapse to one snapshot per (entity, slot): highest tiebreak
    // tuple wins — max_by over the lexicographic struct, i.e. a HASH
    // aggregate with map-side partials, rather than a rank window whose
    // sort pays O(n log n) per group and shuffles every input row (the
    // dominant cost of the fill at fact scale).
    val daily = snapshots
      .groupBy(col("entity"), col("snap_date"))
      .agg(max_by(col("value"), struct(tiebreaks.map(col): _*)).as("value"))

    // Both sides descend from the same `snapshots` lineage — alias them
    // explicitly so the entity equi-condition references two DISTINCT
    // plans (an unaliased scaffold("entity") === daily("entity") only
    // resolves via dataset-id disambiguation and Spark warns
    // "trivially true equals predicate").
    // Entities come from a second, 1-column scan of `snapshots` rather
    // than from `daily`: the dedup-window subtree is NOT reusable across
    // the two branches (column pruning canonicalizes the exchanges
    // differently), so deriving entities from `daily` would re-run the
    // rank window — strictly more expensive at scale than a pruned
    // entity-only scan with partial-aggregated distinct.
    val scaffold = snapshots.select(col("entity")).distinct()
      .crossJoin(broadcast(days)).alias("ff_scaffold")
    val filled = scaffold
      .join(daily.alias("ff_daily"),
        col("datum") === col("snap_date") &&
          col("ff_scaffold.entity") === col("ff_daily.entity"), "left")
      .select(col("ff_scaffold.entity"), col("datum"), col("value"))
      .withColumn("value",
        last(col("value"), ignoreNulls = true).over(
          Window.partitionBy(col("entity")).orderBy(col("datum"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    filled.where(col("value").isNotNull)
  }
}
