package graft.vector

import graft.Graft.LeaseOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Johnson–Lindenstrauss random projection of the embedding corpus
  * (64 → 16 dims with a ±1 sign matrix — Achlioptas 2001's database-
  * friendly construction) plus the cosine-distortion audit that tells
  * you whether the compressed vectors are still usable for retrieval:
  * mean/max |cos_orig − cos_proj| per label over label-blocked pairs.
  * Dim reduction is the cheapest lever on ANN cost (4× fewer floats =
  * 4× less shuffle and dot-product work in every downstream index);
  * the audit is the measured evidence it didn't destroy the geometry.
  *
  * The sign matrix is md5-derived ([[PortableHash]] parity) and folds
  * into the plan as LITERAL arrays — projection is 16 codegen'd
  * `vec_dot` calls per row, map-only (the LSH-hyperplane idiom,
  * [[Similarity.annLsh]]). No scaling factor: cosine is scale-
  * invariant, so the 1/√k normalization cancels. The pair audit is
  * blocked by the TRAINED IVF CELL (the landed `ivf_assign` artifact —
  * the [[Similarity.cosineNearDupInCells]] discipline): a fixed-
  * cardinality label block's width grows with the corpus, so the audit
  * pairs would go quadratic exactly like the q24 near-dup did; cell
  * width is held ~constant by the corpus-scaled codebook, and a
  * cell-bounded pair SAMPLE measures distortion just as well (the
  * audit is a statistic, not an enumeration). Errors roll up as
  * floor-ppm integers — exact, order-immune.
  */
object RandomProjection {
  val InDims = 64
  val OutDims = 16

  /** ±1.0 sign for input dim i, output dim j — parity of the portable
    * 28-bit hash of "jl:i:j" (same derivation inlined in the oracle). */
  def sign(i: Int, j: Int): Double =
    if (PortableHash.h28jvm(s"jl:$i:$j") % 2 == 0) 1.0 else -1.0

  /** Column j of the sign matrix, a literal for [[Similarity.dotCol]]. */
  def signCol(j: Int): Seq[Double] = (0 until InDims).map(sign(_, j))

  /** Per-label distortion audit: (label, n_pairs, mean_abs_err_ppm,
    * max_abs_err_ppm) where err = |cos_orig − cos_proj| over the
    * SAME-LABEL pairs sharing a trained IVF cell (`assign` = the
    * landed rn-ranked assignment; rn = 1 rows block the pairs). The
    * same-label restriction keeps the rollup per-label; the cell block
    * keeps the candidate count corpus-independent. */
  def distortionAudit(embeddings: DataFrame, assign: DataFrame): DataFrame = {
    val proj = array((0 until OutDims).map(j =>
      Similarity.dotCol(col("v"), typedLit(signCol(j)))): _*)
    val pr = graft.Par.fanOut(embeddings)
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("p", proj)
      .select(col("vec_id"), col("label"), col("v"), col("p"),
        sqrt(Similarity.dotExpr("v", "v")).as("nv"),
        sqrt(Similarity.dotExpr("p", "p")).as("np"))
      .join(assign.where(col("rn") === 1).select(col("vec_id"), col("cell")),
        Seq("vec_id"))
      .leased // both sides of the in-cell pair join
    val a = pr.select(col("cell"), col("label"), col("vec_id").as("qid"), col("v").as("va"),
      col("p").as("pa"), col("nv").as("nva"), col("np").as("npa"))
    val b = pr.select(col("cell"), col("label").as("label_b"), col("vec_id").as("nid"),
      col("v").as("vb"), col("p").as("pb"), col("nv").as("nvb"), col("np").as("npb"))
    graft.operators.SkewJoin.salted(a, b, Seq("cell"), Similarity.CellSalt)
      .where(col("qid") < col("nid") && col("label") === col("label_b"))
      .where(col("nva") > 0 && col("nvb") > 0 && col("npa") > 0 && col("npb") > 0)
      .withColumn("cos_o", Similarity.dotExpr("va", "vb") / (col("nva") * col("nvb")))
      .withColumn("cos_p", Similarity.dotExpr("pa", "pb") / (col("npa") * col("npb")))
      .withColumn("err_ppm", expr("CAST(floor(abs(cos_o - cos_p) * 1000000.0) AS BIGINT)"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("err_ppm")).as("sum_err_ppm"),
        max(col("err_ppm")).as("max_abs_err_ppm"))
      .select(col("label"), col("n_pairs"),
        expr("sum_err_ppm div n_pairs").as("mean_abs_err_ppm"),
        col("max_abs_err_ppm"))
      .orderBy("label")
  }
}
