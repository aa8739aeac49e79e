package graft.vector

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PqReconSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8 // m=2 → dsub=4
  private val v0 = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0)
  private val v1 = Seq(-1.0, 0.5, 0.0, 2.0, 1.0, -3.0, 4.0, 0.25)

  private def emb = Seq((0L, "a", v0.map(_.toFloat)), (1L, "a", v1.map(_.toFloat)))
    .toDF("vec_id", "label", "embedding")

  private def booksOf(b0: Seq[Seq[Double]], b1: Seq[Seq[Double]]) =
    (b0.zipWithIndex.map { case (c, j) => (0, j, c) } ++
     b1.zipWithIndex.map { case (c, j) => (1, j, c) }).toDF("subspace", "code", "cv")

  private def assign = Seq((0L, 0L, 1), (1L, 0L, 1)).toDF("vec_id", "cell", "rn")

  test("a codebook containing the exact subvectors reconstructs with zero error") {
    val books = Seq(Seq(v0.take(4), v1.take(4)), Seq(v0.drop(4), v1.drop(4)))
    val codes = ProductQuant.encode(emb, dim, books)
    val r = ProductQuant.cellReconstructionError(
      emb, codes, booksOf(books(0), books(1)), assign, dim, m = 2).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("mean_err_fix") == 0L)
    assert(r.head.getAs[Long]("max_err_fix") == 0L)
    assert(r.head.getAs[Long]("n_vectors") == 2L)
  }

  test("a perturbed codebook reports positive fixed-point error") {
    // nudge one dimension of one entry by 0.5 → that vector's error is
    // at least floor(0.5·2^20)² while the other stays exact
    val books = Seq(
      Seq(v0.take(4).updated(0, v0.head + 0.5), v1.take(4)),
      Seq(v0.drop(4), v1.drop(4)))
    val codes = ProductQuant.encode(emb, dim, books)
    val r = ProductQuant.cellReconstructionError(
      emb, codes, booksOf(books(0), books(1)), assign, dim, m = 2).collect()
    val d = 524288L // floor(0.5 · 2^20)
    assert(r.head.getAs[Long]("max_err_fix") >= d * d)
  }
}
