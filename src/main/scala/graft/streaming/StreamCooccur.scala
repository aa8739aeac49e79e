package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.Cooccur

/** Streaming co-occurrence edges — the continuous form of
  * [[graft.text.Cooccur]]: per-event-time-window (tok_a, tok_b, w)
  * edge counts over a streaming document table, watermark-bounded
  * state.
  *
  * Pair generation is the SAME stateless per-document projection as
  * batch ([[Cooccur.pairsExpr]] — zero joins, so it is streaming-legal
  * unchanged), which is exactly why the twin exists: a window's edge
  * counts and the batch counts over the same documents are THE SAME
  * EDGES with the same weights, and window tables merge into the
  * corpus `cooccur_edges` artifact by weight addition (spec-gated:
  * stream-built edges equal batch-built edges exactly).
  *
  * Scale posture: aggregation state per window is bounded by the
  * window's distinct pair vocabulary, never the token stream (the
  * map-side combine reduces per-document duplicates before state);
  * the watermark closes windows and evicts them. The corpus graph is
  * then maintained incrementally — add the closed window's weights —
  * instead of re-deriving the edge list from scratch each night.
  */
object StreamCooccur {

  /** Windowed edge counts over a streaming docs table
    * (doc_id, text, ingest_ts). Output per closed window:
    * (window_start, tok_a, tok_b, w). */
  def windowedEdges(docs: DataFrame, window: Int = 3,
                    windowDur: String = "1 hour",
                    watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ingest_ts", watermark)
      .withColumn("ws", expr("filter(split(text, ' '), w -> w <> '')"))
      .select(col("ingest_ts"), explode(Cooccur.pairsExpr(window)).as("p"))
      .select(col("ingest_ts"), col("p.tok_a").as("tok_a"), col("p.tok_b").as("tok_b"))
      .groupBy(org.apache.spark.sql.functions.window(col("ingest_ts"), windowDur),
        col("tok_a"), col("tok_b"))
      .agg(count(lit(1)).as("w"))
      .select(col("window.start").as("window_start"),
        col("tok_a"), col("tok_b"), col("w"))
}
