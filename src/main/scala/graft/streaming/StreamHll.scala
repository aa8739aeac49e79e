package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Hll

/** Streaming HyperLogLog — the continuous form of
  * [[graft.operators.Hll]]: per-event-time-window (key, reg) register
  * maxima over a hashed stream, watermark-bounded state.
  *
  * The batch and streaming sketches share the register derivation
  * ([[Hll.regOf]]/[[Hll.rhoOf]] over the same portable 60-bit hash), so
  * a register table built from an hour's stream window equals the batch
  * operator's registers over the same hour's rows EXACTLY, and windows
  * merge into daily/corpus sketches by register-wise max — the same
  * merge the batch side uses ([[Hll.merge]]); the finalize step
  * ([[Hll.estimate]]) then yields the identical integer estimate
  * (spec-gated: stream ≡ batch).
  *
  * Scale posture: state per (window, key) is ≤ [[Hll.M]] registers
  * regardless of stream rate — the aggregation state IS the sketch; the
  * watermark closes windows and evicts them. Cardinality-over-time
  * dashboards read the finalized estimates; late joiners re-merge
  * closed windows instead of rescanning events.
  */
object StreamHll {

  /** Windowed register table over a streaming hashed table. `hashed`:
    * streaming DataFrame with (key, hash 60-bit, ingest_ts: timestamp).
    * Output per closed window: (window_start, key, reg, m_j). */
  def windowedRegisters(hashed: DataFrame, key: String, hashCol: String,
                        windowDur: String = "1 hour",
                        watermark: String = "1 hour"): DataFrame =
    hashed
      .withWatermark("ingest_ts", watermark)
      .select(col("ingest_ts"), col(key),
        Hll.regOf(col(hashCol)).as("reg"), Hll.rhoOf(col(hashCol)).as("rho"))
      .groupBy(window(col("ingest_ts"), windowDur), col(key), col("reg"))
      .agg(max(col("rho")).as("m_j"))
      .select(col("window.start").as("window_start"), col(key), col("reg"), col("m_j"))
}
