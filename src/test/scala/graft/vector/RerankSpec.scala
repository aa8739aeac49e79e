package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Retrieve-then-rerank ([[Similarity.rerankExact]]): the exact stage
  * must re-order the candidate short list by true cosine without
  * adding, dropping, or re-scoring beyond it. */
class RerankSpec extends SparkSpec {
  import spark.implicits._

  // Hand-built geometry: q0's true nearest is v2 (cos 1.0 — same
  // direction), then v1 (cos ~0.948), then v3 (orthogonal, cos 0).
  // The candidate list deliberately arrives in the WRONG order.
  private def emb = Seq(
    (0L, "a", Array(1.0f, 0.0f)),
    (1L, "a", Array(3.0f, 1.0f)),
    (2L, "a", Array(2.0f, 0.0f)),
    (3L, "a", Array(0.0f, 1.0f))
  ).toDF("vec_id", "label", "embedding")

  private def candidates = Seq(
    (0L, 3L, 1L), // retriever rank 1 → true rank 3
    (0L, 1L, 2L), // rank 2 → true rank 2
    (0L, 2L, 3L)  // rank 3 → true rank 1
  ).toDF("qid", "nid", "rank")

  test("reranks candidates by exact cosine and flags every move") {
    val out = Similarity.rerankExact(emb, candidates)
      .select("qid", "nid", "retr_rank", "rr_rank", "cos_micro", "moved")
      .as[(Long, Long, Long, Long, Long, Int)].collect()
    assert(out.map(_._2).toSeq == Seq(2L, 1L, 3L), s"rerank order wrong: ${out.toSeq}")
    assert(out.map(_._4).toSeq == Seq(1L, 2L, 3L))
    assert(out.filter(_._2 == 2L).head._5 == 1000000L) // exact cos 1.0
    assert(out.filter(_._2 == 3L).head._5 == 0L)       // orthogonal
    assert(out.map(_._6).toSeq == Seq(1, 0, 1), "moved flags wrong")
  }

  test("touches only the candidate list: one output row per candidate") {
    val out = Similarity.rerankExact(emb, candidates)
    assert(out.count() == 3)
    assert(out.select("qid").distinct().as[Long].collect().toSeq == Seq(0L))
  }

  test("agrees with brute force on the corpus: reranking exact-kNN output never moves it") {
    val embc = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bf = Similarity.knnBruteForce(embc, k = 3).select("qid", "nid", "rank")
    // exact kNN within a label block is already cosine-ordered, and the
    // rerank scores the same pairs with the same arithmetic — nothing moves
    val moved = Similarity.rerankExact(embc, bf).where(col("moved") === 1).count()
    assert(moved == 0, s"rerank of exact kNN moved $moved rows")
  }
}
