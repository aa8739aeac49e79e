package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming per-label centroid state — the continuous form of
  * [[graft.vector.Similarity.labelOutliers]]'s fixed-point centroid:
  * per (label, pos), the running BIGINT sums (s, n) of
  * floor((x + 1)·2²⁰) over an embedding stream.
  *
  * Because the state is EXACT integers, a centroid folded from any
  * batching, partitioning, or arrival order of the stream equals the
  * batch-built centroid bit-for-bit (spec-gated) — the property a
  * float running mean cannot offer (its value depends on accumulation
  * order, so stream and batch drift apart). This is the same
  * merge-exactness argument as the q63 rollup fold and the KMV state:
  * pick state whose merge is associative/commutative/exact, and
  * incremental ≡ recompute stops being approximate.
  *
  * Scale posture: aggregation state is labels × dim rows regardless of
  * stream length — the state IS the centroid numerator/denominator.
  * The same expression tree runs unchanged over a batch DataFrame
  * (used by the spec to pin stream ≡ batch).
  */
object StreamCentroid {

  /** Running (label, pos) → (s, n) over an embedding table
    * (label, embedding: array<float>) — streaming (complete mode) or
    * batch. Centroid coordinate = (s div n)/2²⁰ − 1, exactly as the
    * batch outlier detector derives it. */
  def centroidState(emb: DataFrame): DataFrame =
    emb.select(col("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(floor((col("x") + 1) * lit(1048576L)).cast("long")).as("s"),
        count(lit(1)).as("n"))
}
