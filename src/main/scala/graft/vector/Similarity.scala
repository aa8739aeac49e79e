package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity-search operators over an
  * embedding column (`Array[Float]`, cast to doubles once at the scan).
  *
  * Two paths, matching how a 100 TB pipeline actually runs:
  *  - [[knnBruteForce]]: exact top-k within a blocking key (here the
  *    corpus `label`; in production a coarse IVF cell id). The quadratic
  *    cost is confined to a block; the join shuffles both sides once on
  *    the block key. Never call without a blocking column.
  *  - [[annLsh]]: random-hyperplane LSH — sign-bit bucket per vector
  *    (pure map stage), then exact top-k *within* buckets. This is the
  *    sub-quadratic scale path; recall vs. brute force is measured in
  *    the test suite, and bucket width (number of planes) trades recall
  *    for cost.
  *
  * Dot products run as a sequential left fold over doubles —
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, +)` — which is
  * bit-identical to DuckDB's `list_dot_product`, so cosine scores
  * hash-match the oracle with no rounding.
  *
  * Hyperplanes are md5-derived ([[graft.functions.PortableHash]] scheme):
  * w[j][i] = (h28("hp_<j>_<i>") mod 2001) − 1000 — deterministic,
  * seedless, reproducible in any engine with md5.
  */
object Similarity {

  /** Sequential-fold dot product of two array<double> column names. */
  def dotExpr(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")

  /** Vectors with their L2 norms precomputed (norm once per row, not per
    * pair). Input columns: vec_id, label, embedding: array<float>. */
  private def prepared(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("nrm", sqrt(dotExpr("v", "v")))
      .select(col("vec_id"), col("label"), col("v"), col("nrm"))

  /** Exact cosine top-k per vector within its `label` block.
    * Output: qid, rank (1..k), nid, cosine — ties broken by nid. */
  def knnBruteForce(embeddings: DataFrame, k: Int = 3): DataFrame = {
    val e = prepared(embeddings)
    val q = e.select(col("vec_id").as("qid"), col("label"),
      col("v").as("va"), col("nrm").as("na"))
    val n = e.select(col("vec_id").as("nid"), col("label"),
      col("v").as("vb"), col("nrm").as("nb"))
    val pairs = q.join(n, Seq("label")).where(col("qid") =!= col("nid"))
      .withColumn("cosine", dotExpr("va", "vb") / (col("na") * col("nb")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    pairs.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cosine"))
      .orderBy("qid", "rank")
  }

  /** Deterministic md5-derived hyperplane row j (as a SQL fragment with
    * free variable `j`): dim integers in [-1000, 1000] cast to double. */
  private def planeRowSql(dim: Int): String =
    s"""transform(sequence(1, $dim), i ->
       |  CAST(CAST(conv(substring(md5(concat('hp_', j, '_', i)), 1, 7), 16, 10) AS BIGINT)
       |       % 2001 - 1000 AS DOUBLE))""".stripMargin

  /** Random-hyperplane LSH bucket id (0 .. 2^planes − 1) for column `v`
    * (array<double>): bit j = sign(w_j · v). Self-contained — the plane
    * matrix is inlined, constant-folded by Catalyst. */
  def bucketExpr(planes: Int, dim: Int): Column =
    expr(s"""aggregate(sequence(0, ${planes - 1}), 0L, (acc, j) ->
            |  acc + CASE WHEN aggregate(zip_with(${planeRowSql(dim)}, v,
            |                            (x, y) -> x * y),
            |                  CAST(0.0 AS DOUBLE), (a2, x) -> a2 + x) > CAST(0.0 AS DOUBLE)
            |             THEN shiftleft(1L, j) ELSE 0L END)""".stripMargin)

  /** ANN top-k via hyperplane-LSH bucketing: exact cosine only within a
    * bucket. Vectors in sparse buckets may return fewer than k
    * neighbors — the accepted ANN trade-off (recall measured in tests). */
  def annLsh(embeddings: DataFrame, planes: Int = 6, dim: Int = 64, k: Int = 3): DataFrame = {
    val e = prepared(embeddings)
      .withColumn("bucket", bucketExpr(planes, dim))
      .select(col("vec_id"), col("v"), col("nrm"), col("bucket"))
    val q = e.select(col("vec_id").as("qid"), col("bucket"),
      col("v").as("va"), col("nrm").as("na"))
    val n = e.select(col("vec_id").as("nid"), col("bucket"),
      col("v").as("vb"), col("nrm").as("nb"))
    val pairs = q.join(n, Seq("bucket")).where(col("qid") =!= col("nid"))
      .withColumn("cosine", dotExpr("va", "vb") / (col("na") * col("nb")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    pairs.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cosine"))
      .orderBy("qid", "rank")
  }
}
