package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-dimension int8 scalar quantization of an embedding corpus + the
  * reconstruction-error audit that tells you whether 8 bits suffice —
  * the lightweight alternative to product quantization
  * ([[ProductQuant]]): SQ8 keeps one byte per DIMENSION with no trained
  * codebook (4× smaller than float32, exact per-dim scales), PQ keeps
  * one byte per SUBSPACE (32× smaller, lossier). Vector stores ship
  * both; the audit (mean squared reconstruction error per label) is how
  * you choose.
  *
  * Plan shape: one aggregate pass for per-dimension min/max (dim rows —
  * a literal-sized stats frame, broadcast back), one map-side encode
  * pass (posexplode → broadcast join on pos → integer code), one exact
  * integer rollup. No driver state, no collect; the only shuffles are
  * the dim-row stats aggregate and the per-label rollup.
  *
  * Numerics: codes are `floor((val-mn)*255/(mx-mn))` clamped to 255,
  * computed in DOUBLE with identical association in Spark and DuckDB
  * (IEEE ops match when the expression tree matches — the VecCte
  * convention). The error rollup is integer fixed point
  * (`floor(diff² · 2^30)` per cell, BIGINT-summed — exact and
  * order-immune; at trillions of vectors lift the sum to DECIMAL(38,0)
  * as in q91). */
object ScalarQuant {

  val Levels = 255L
  /** diff² fixed-point scale: 2^30 (per-cell diff² ≤ (range/255)² —
    * tiny — so a coarse 2^20 would floor most cells to 0). */
  val ErrScale = 1073741824L

  /** Per-label audit: (label, n_vecs, sum_err_fix, mean_err_fix) where
    * err is the squared L2 reconstruction error of the SQ8 round-trip,
    * fixed-point 2^-30, and mean is per vector (integer div). */
  def reconstructionAudit(embeddings: DataFrame): DataFrame = {
    val flat = embeddings
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "val")))
    val stats = flat.groupBy(col("pos"))
      .agg(min(col("val")).as("mn"), max(col("val")).as("mx"))
    val cells = flat.join(broadcast(stats), Seq("pos"))
      .withColumn("code", expr(
        s"CASE WHEN mx > mn THEN least($Levels, CAST(floor((val - mn) * $Levels.0 / (mx - mn)) AS BIGINT)) ELSE CAST(0 AS BIGINT) END"))
      .withColumn("recon", expr(
        s"CASE WHEN mx > mn THEN mn + (CAST(code AS DOUBLE) + 0.5) * (mx - mn) / $Levels.0 ELSE mn END"))
      .withColumn("e_fix", expr(
        s"CAST(floor((val - recon) * (val - recon) * $ErrScale.0) AS BIGINT)"))
    val nVecs = embeddings.groupBy(col("label")).agg(count(lit(1)).as("n_vecs"))
    cells.groupBy(col("label")).agg(sum(col("e_fix")).as("sum_err_fix"))
      .join(nVecs, Seq("label"))
      .select(col("label"), col("n_vecs"), col("sum_err_fix"),
        expr("sum_err_fix div n_vecs").as("mean_err_fix"))
      .orderBy("label")
  }
}
