package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProductQuantSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** Small deterministic corpus: 24 vectors in 8 dims, ids 0..23. */
  private lazy val emb: DataFrame = {
    val rows = (0L until 24L).map { id =>
      val v = (0 until dim).map(i =>
        ((graft.functions.PortableHash.h28jvm(s"pq_${id}_$i") % 200) - 100).toFloat / 100f)
      (id, (id % 3).toString, v)
    }
    rows.toDF("vec_id", "label", "embedding")
  }

  private lazy val books = ProductQuant.trainCodebooks(emb, dim, m = 2, ksub = 4, sampleMod = 1)
  private lazy val ivfBook = Similarity.codebookDf(spark,
    Similarity.trainIvfCentroids(emb, ncells = 2, iters = 2, sampleMod = 1))

  test("codebooks: m subspaces × ksub centroids of the subspace dimension; deterministic") {
    assert(books.length == 2)
    assert(books.forall(b => b.length == 4 && b.forall(_.length == dim / 2)))
    val again = ProductQuant.trainCodebooks(emb, dim, m = 2, ksub = 4, sampleMod = 1)
    assert(books == again)
  }

  test("codes are in range and deterministic") {
    val codes = ProductQuant.encode(emb, dim, books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(codes.size == 24)
    assert(codes.values.forall(cs => cs.length == 2 && cs.forall(c => c >= 0 && c < 4)))
    val again = ProductQuant.encode(emb, dim, books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(codes == again)
  }

  test("exhaustive params (probe all cells, unbounded shortlist) equal global brute-force knn") {
    val pq = ProductQuant.annIvfPq(emb, ivfBook, books, dim,
      k = 3, nprobe = 2, shortlist = 24)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val bf = Similarity.knnBruteForce(emb.withColumn("label", lit(0)), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2))).toSeq
    assert(pq == bf) // re-rank is exact cosine → identical top-k incl. tie order
  }

  test("default shortlist keeps recall high vs brute force") {
    val pq = ProductQuant.annIvfPq(emb, ivfBook, books, dim, k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val bf = Similarity.knnBruteForce(emb.withColumn("label", lit(0)), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (pq & bf).size.toDouble / bf.size
    assert(recall >= 0.7, s"recall $recall")
  }

  test("empty codebooks (no corpus) return an empty result, not an error") {
    assert(ProductQuant.annIvfPq(emb, ivfBook, Seq.empty, dim).count() == 0)
  }
}
