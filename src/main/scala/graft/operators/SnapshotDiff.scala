package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the change-data-capture primitive: given two
  * keyed snapshots of the same entity set, emit one row per difference
  * as insert / delete / update with the old and new values side by
  * side. This is the inverse of the SCD2 merge ([[Scd2]] turns a
  * stream of snapshots into versions; diff turns two snapshots back
  * into the change feed), and the reconciliation tool for validating
  * a replicated table against its source.
  *
  * Scale posture (100 TB): one full-outer hash join on the key —
  * co-partitioned if both snapshots are bucketed by the key
  * ([[graft.sources.Ingest.writeBucketed]]), in which case the diff is
  * exchange-free; value comparison is null-safe (`<=>`) so NULL ↔
  * value transitions surface as updates, not joins lost to NULL
  * semantics (the round-1 SCD2 lesson).
  */
object SnapshotDiff {

  /** Differences from `before` to `after`, both keyed by `key`.
    * `compareCols` are the tracked attributes. Output: (key,
    * change_type ∈ {insert, delete, update}, old_<c>, new_<c> per
    * compared column); unchanged rows are dropped. */
  def diff(before: DataFrame, after: DataFrame, key: String,
           compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compared column")
    val b = before.select((key +: compareCols).map(col): _*)
      .withColumn("__b", lit(1))
    val a = after.select((key +: compareCols).map(col): _*)
      .toDF((s"${key}_a" +: compareCols.map(c => s"${c}_a")): _*)
      .withColumn("__a", lit(1))
    val joined = b.join(a, col(key) === col(s"${key}_a"), "full_outer")
    val changed = compareCols
      .map(c => !(col(c) <=> col(s"${c}_a")))
      .reduce(_ || _)
    joined
      .withColumn("change_type",
        when(col("__b").isNull, lit("insert"))
          .when(col("__a").isNull, lit("delete"))
          .when(changed, lit("update")))
      .where(col("change_type").isNotNull)
      .select(
        coalesce(col(key), col(s"${key}_a")).as(key) +:
          col("change_type") +:
          compareCols.flatMap(c =>
            Seq(col(c).as(s"old_$c"), col(s"${c}_a").as(s"new_$c"))): _*)
  }

  /** Apply a [[diff]]-shaped change feed to `before` — the MERGE INTO /
    * CDC-apply half of the pair: inserts and updates land their `new_*`
    * values, deletes drop the key, untouched rows pass through. Exact
    * inverse of [[diff]]: `applyChanges(a, diff(a, b), k, cs) ≡ b`
    * (property-gated in SnapshotDiffSpec, oracle-replayed in q97).
    *
    * Scale posture: a changeset is normally ≪ the snapshot, so the
    * left-anti probe broadcasts; at comparable sizes both sides hash-
    * partition on the key (exchange-free when the snapshot is bucketed,
    * same as [[diff]]). The union adds no shuffle.
    */
  def applyChanges(before: DataFrame, changes: DataFrame, key: String,
                   compareCols: Seq[String]): DataFrame = {
    val touched = changes.select(col(key))
    val upserts = changes.where(col("change_type") =!= "delete")
      .select(col(key) +: compareCols.map(c => col(s"new_$c").as(c)): _*)
    before.select((key +: compareCols).map(col): _*)
      .join(touched, Seq(key), "left_anti")
      .unionByName(upserts)
  }
}
