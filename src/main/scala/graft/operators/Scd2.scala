package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type-2 merge operators — the heart of the
  * reference system (SURVEY.md §2.6).
  *
  * Open versions carry the sentinel end time `2999-12-31 23:59:59`
  * (process_orders_sqls.py:1; rationale for not using year 9999:
  * docs/cheat-sheets/postgresql.md:100). All intervals are half-open
  * `[start_time, end_time)`.
  */
object Scd2 {
  val Sentinel = "2999-12-31 23:59:59"

  /** SCD2-SNAPSHOT (products; full daily snapshot input) —
    * process_orders_sqls.py:28-51 / postgresql.md:73-98.
    *
    * Input `dim` columns: id, attrs..., start_time, end_time, processed_time.
    * Input `stg` columns: id, attrs... (one row per id — full snapshot).
    *
    * Semantics, faithfully:
    *  1. close every CURRENT version whose tracked attrs differ from the
    *     staging row of the same id: end_time ← batchTs;
    *  2. insert every staging row whose id is not among the versions STILL
    *     current after step 1 (i.e. changed or brand-new ids) with
    *     [batchTs, sentinel). Rows deleted from the snapshot stay open
    *     forever — faithful-to-reference behavior.
    *
    * Change detection is null-safe (`IS DISTINCT FROM`, the fix the
    * reference itself documents at docs/guides.md:65) — the reference's raw
    * `<>` (process_orders_sqls.py:35) would silently ignore NULL flips.
    *
    * Scale: one shuffle-free broadcast-able join if stg is small, or a
    * key-partitioned shuffle join otherwise; the rewrite cost is bounded by
    * dim size, never by fact size. No driver-side collection.
    */
  def snapshotMerge(dim: DataFrame, stg: DataFrame, attrs: Seq[String], batchTs: String): DataFrame = {
    val ts = to_timestamp(lit(batchTs))
    val sentinel = to_timestamp(lit(Sentinel))
    val changed = attrs.map(a => !(col(a) <=> col(s"stg_$a"))).reduce(_ || _)
    val stgRenamed = stg.select((col("id").as("stg_id") +: attrs.map(a => col(a).as(s"stg_$a"))): _*)

    val isCurrent = ts >= col("start_time") && ts < col("end_time")

    // The close set is computed ONCE on a narrow (id + tracked attrs)
    // projection and reused by both steps — round-1 review flagged that
    // deriving still-current from the updated frame re-evaluated the full
    // wide dim⨝stg join.
    val closeIds = dim.where(isCurrent)
      .join(stgRenamed, col("id") === col("stg_id"))
      .where(changed)
      .select(col("id")).distinct()

    val updated = dim.join(closeIds.withColumn("closing", lit(true)), Seq("id"), "left")
      .withColumn("end_time", when(isCurrent && col("closing"), ts).otherwise(col("end_time")))
      .select(dim.columns.map(col): _*)

    // Versions still current AFTER the close step (load-bearing ordering,
    // process_orders_sqls.py:37-39): current-before minus just-closed ids.
    val stillCurrent = dim.where(isCurrent).select(col("id"))
      .join(closeIds, Seq("id"), "left_anti")
    val inserts = stg.join(stillCurrent, Seq("id"), "left_anti")
      .withColumn("start_time", ts)
      .withColumn("end_time", sentinel)
      .withColumn("processed_time", ts)
      .select(dim.columns.map(col): _*)

    updated.unionByName(inserts)
  }

  /** SCD2-EVENTS (orders; incremental event input) —
    * process_orders_sqls.py:92-133, diagrammed in
    * examples/events-to-scd-type-2.png.
    *
    * Input `dim` columns: order_id, status, event_time, processed_time,
    *   start_time, end_time. Input `events` columns: id, status, event_time,
    *   tiebreak (any orderable column making (id, event_time, tiebreak)
    *   unique — determinism the reference leaves engine-defined).
    *
    * Faithful semantics:
    *  1. close current dim rows whose status differs from the EARLIEST
    *     incoming event of the same id, at batch time (not event time —
    *     faithful quirk, process_orders_sqls.py:104);
    *  2. dedup events on (id, status) keeping the first occurrence
    *     (quirk: A→B→A collapses to two versions), re-sequence, and chain
    *     versions with end_time = next surviving event's time, else sentinel.
    *     The reference's self-join on rn = rn-1 (process_orders_sqls.py:122)
    *     is replaced by `lead()` — identical semantics, one shuffle fewer.
    *  3. idempotence guard the reference lacks: anti-join the new version
    *     rows against existing (order_id, start_time) keys before appending
    *     (its UNIQUE constraint would have raised instead).
    *
    * If `events` has no `tiebreak` column one is synthesized as a
    * deterministic md5-derived hash of the whole row (round-1 review: no
    * corpus table ships a column literally named `tiebreak`).
    *
    * INPUT CONTRACT — cross-batch event-time monotonicity per id: every
    * event in batch N+1 must carry an event_time strictly after the
    * start_time of the id's open version from batch N (the natural shape
    * when batches are daily files). The close step's `start_time <
    * evt_time` guard exists for replay idempotence; if a LATER batch
    * delivers an out-of-order event (event_time ≤ the open version's
    * start_time, different status), the close is skipped while step 2
    * still appends — leaving two open versions for that id. That input
    * is out of contract (the reference pipeline cannot encounter it:
    * daily files partition event time), and Scd2Spec pins the behavior
    * so a future change is a conscious one.
    */
  def eventsMerge(dim: DataFrame, events0: DataFrame, batchTs: String): DataFrame = {
    val events = Tiebreak.ensure(events0)
    val ts = to_timestamp(lit(batchTs))
    val sentinel = to_timestamp(lit(Sentinel))

    val byIdTime = Window.partitionBy(col("id")).orderBy(col("event_time"), col("tiebreak"))
    val byIdStatus = Window.partitionBy(col("id"), col("status"))
      .orderBy(col("event_time"), col("tiebreak"))

    // Step 1: earliest incoming event per id (W1) closes a differing current
    // row — but only one that STARTED BEFORE that event. Without the time
    // guard, replaying a batch re-closes the version the batch itself
    // produced (caught by the ScalaCheck idempotence property); with it,
    // normal daily flow is untouched (yesterday's versions always predate
    // today's events) and re-runs are true no-ops. The reference itself
    // would corrupt here (no guard in process_orders_sqls.py:100-105) —
    // documented divergence, like the insert-side guard below.
    val firstEvent = events
      .withColumn("rn", row_number().over(byIdTime)).where(col("rn") === 1)
      .select(col("id").as("evt_id"), col("status").as("evt_status"),
        col("event_time").as("evt_time"))
    val isCurrent = ts >= col("start_time") && ts < col("end_time")
    val closed = dim.join(firstEvent, col("order_id") === col("evt_id"), "left")
      .withColumn("end_time",
        when(isCurrent && col("evt_id").isNotNull && !(col("status") <=> col("evt_status")) &&
             col("start_time") < col("evt_time"), ts)
          .otherwise(col("end_time")))
      .select(dim.columns.map(col): _*)

    // Step 2: dedup (id,status) keep-first (W2), then chain with lead (W3/W4/J3).
    val versions = events
      .withColumn("dup", row_number().over(byIdStatus)).where(col("dup") === 1)
      .withColumn("next_time", lead(col("event_time"), 1).over(byIdTime))
      .select(
        col("id").as("order_id"),
        col("status"),
        col("event_time"),
        ts.as("processed_time"),
        col("event_time").as("start_time"),
        coalesce(col("next_time"), sentinel).as("end_time"))

    // Step 3: idempotent append (divergence from reference documented above).
    val fresh = versions.join(
      closed.select(col("order_id"), col("start_time")),
      Seq("order_id", "start_time"), "left_anti")

    closed.unionByName(fresh)
  }
}
