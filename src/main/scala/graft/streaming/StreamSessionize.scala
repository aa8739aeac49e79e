package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming gap-based sessionization — the continuous twin of
  * [[graft.operators.Sessionize]]: Structured Streaming's native
  * `session_window` aggregation merges events into sessions that close
  * when `gap` elapses with no event, emitting one row per finalized
  * session once the watermark passes its end.
  *
  * Batch/stream consistency (spec-gated): for the same events and the
  * same gap, the finalized stream sessions carry the same
  * (user, n_events, start, end) as the batch operator's sessions —
  * session_window merges on event time exactly like the batch lag-gap
  * walk. (The batch side numbers sessions per user; the stream side
  * identifies them by start time — a session_seq needs the user's full
  * history, which a stream by definition doesn't hold.) Boundary
  * convention: silence of EXACTLY the gap splits here (session_window
  * is [t, t+gap) half-open) but merges in the batch operator (strict
  * `> gap`); off-boundary event streams agree exactly.
  *
  * Scale posture: state per key is the set of OPEN windows for that
  * user (merged eagerly as events arrive), evicted at the watermark —
  * state never grows with history, only with concurrent open sessions.
  */
object StreamSessionize {

  /** Finalized sessions per user from a streaming (user_id, ts) frame.
    * Output: (user_id, session_start, session_end, n_events) — start/
    * end formatted with the engine-portable timestamp convention. */
  def byGap(events: DataFrame, gap: String = "30 minutes",
            watermark: String = "30 minutes"): DataFrame = {
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))
      .select(col("user_id"),
        date_format(col("first_ts"), fmt).as("session_start"),
        date_format(col("last_ts"), fmt).as("session_end"),
        col("n_events"))
  }
}
