package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.vector.Similarity

class StreamMarginMineSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"smine_$tag").toString

  // the SimilaritySpec 3-label construction: labels 0/1 in the corpus,
  // batches of label-2 vectors arrive; one planted near-dup per batch
  private def v(i: Int): Array[Float] = {
    val a = Array.fill(8)(0.01f); a(i % 8) = 1.0f; a
  }
  private val corpus = Seq(
    (0L, v(0), 0), (1L, v(1), 0), (2L, v(2), 0),
    (10L, v(3), 1), (11L, v(4), 1)).toDF("vec_id", "embedding", "label")
  private val batch1 = Seq((20L, v(0), 2), (21L, v(5), 2)).toDF("vec_id", "embedding", "label")
  private val batch2 = Seq((30L, v(1), 2), (31L, v(6), 2)).toDF("vec_id", "embedding", "label")

  private val codebook = Similarity.codebookDf(spark,
    Similarity.trainIvfCentroids(
      corpus.unionByName(batch1).unionByName(batch2), ncells = 1, iters = 1, sampleMod = 1))
  private val assign = corpus.select(col("vec_id"), lit(0L).as("cell"), lit(1).as("rn"))
  private val denoms = Similarity.marginDenoms(corpus, assign)

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
    df.select("vec_new", "vec_corpus", "cos_micro", "margin_ppm")
      .as[(Long, Long, Long, Long)].collect().toSet

  test("streamed mining equals the per-batch operator, and replay overwrites idempotently") {
    val out = tmp("o") + "/mined"
    StreamMarginMine.mergeBatch(spark, batch1, 0L, corpus, assign, codebook, denoms, out)
    StreamMarginMine.mergeBatch(spark, batch2, 1L, corpus, assign, codebook, denoms, out)
    val streamed = canon(StreamMarginMine.minedPairs(spark, out))
    val direct =
      canon(Similarity.marginMiningBetween(batch1, corpus, assign, codebook,
        corpusDenoms = Some(denoms))) ++
      canon(Similarity.marginMiningBetween(batch2, corpus, assign, codebook,
        corpusDenoms = Some(denoms)))
    assert(streamed == direct)
    // the planted near-dups were mined (not a vacuous pass)
    assert(streamed.exists { case (n, c, _, _) => (n, c) == ((20L, 0L)) })
    assert(streamed.exists { case (n, c, _, _) => (n, c) == ((30L, 1L)) })
    // redelivery: same rows, no duplicates (partition overwrite)
    val before = StreamMarginMine.minedPairs(spark, out).count()
    StreamMarginMine.mergeBatch(spark, batch1, 0L, corpus, assign, codebook, denoms, out)
    assert(StreamMarginMine.minedPairs(spark, out).count() == before)
  }
}
