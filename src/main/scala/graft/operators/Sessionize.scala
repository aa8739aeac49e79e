package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the classic clickstream/event-pipeline
  * operator: a user's events belong to one session until a silence
  * longer than `gap` separates them, then a new session starts.
  *
  * Shape: one window pass per user (lag to detect gaps, running sum of
  * the boundary flags to number sessions) + the per-session aggregate.
  * Gap detection compares integer epoch-MICROSECONDS (unix_micros ≡
  * DuckDB epoch_us), so session boundaries are exact in both engines —
  * no interval/float arithmetic.
  *
  * Scale posture (100 TB): both windows partition by user — parallelism
  * = user cardinality, shuffle keys never skew beyond one user's events
  * (a bot user is a data-quality problem upstream, or a SkewJoin-style
  * salt on (user, day)). This is the bounded-key window pattern q06/q09
  * already rely on; nothing global, nothing driver-side. */
object Sessionize {

  /** Sessions per user: `events` needs (user_id, ts, event_id); ties
    * break by event_id (the corpus's (user, ts, event) uniqueness).
    * Output: user_id, session_seq (1-based), n_events, session_start,
    * session_end (formatted strings — the oracle-portable timestamp
    * convention). */
  def byGap(events: DataFrame, gapMicros: Long = 1800000000L): DataFrame = {
    require(gapMicros > 0, "gap must be positive")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gap = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    events
      .withColumn("new_s", when(gap.isNull || gap > lit(gapMicros), 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_s")).over(run))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        date_format(min(col("ts")), fmt).as("session_start"),
        date_format(max(col("ts")), fmt).as("session_end"))
  }
}
