package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.CountMin

/** Streaming Count-Min sketch — the continuous form of
  * [[graft.text.CountMin]]: per-event-time-window (r, bucket) counters
  * over a token stream, watermark-bounded state.
  *
  * The batch and streaming sketches share the cell function
  * ([[CountMin.cell]]: md5-salted row hashes), so a counter built from
  * an hour's stream window and a counter built by the batch operator
  * over the same hour's tokens are THE SAME CELLS with the same counts
  * — windows merge into daily/corpus sketches by cellwise addition,
  * which is the whole point of a mergeable sketch (spec-gated:
  * stream-built cells equal batch-built cells exactly).
  *
  * Scale posture: state per window is bounded by depth × width cells
  * regardless of token rate (the aggregation state IS the sketch);
  * the watermark closes windows and evicts them. No per-token state
  * anywhere — this is why a sketch, and not an exact counter table,
  * is the streaming-side frequency primitive.
  */
object StreamCountMin {

  /** Windowed sketch over a streaming token table. `toks`: streaming
    * DataFrame with (tok, ingest_ts: timestamp). Output per closed
    * window: (window_start, r, bucket, cnt). */
  def windowedSketch(toks: DataFrame, depth: Int = 4, width: Int = 1024,
                     windowDur: String = "1 hour",
                     watermark: String = "1 hour"): DataFrame = {
    require(depth > 0 && width > 0, "sketch dimensions must be positive")
    toks
      .withWatermark("ingest_ts", watermark)
      .select(col("ingest_ts"), col("tok"),
        explode(expr(s"sequence(0, ${depth - 1})")).as("r"))
      .select(col("ingest_ts"), col("r"), CountMin.cell(width).as("bucket"))
      .groupBy(window(col("ingest_ts"), windowDur), col("r"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("r"), col("bucket"), col("cnt"))
  }
}
