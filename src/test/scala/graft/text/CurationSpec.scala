package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def docs =
    spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))

  test("curation removes every near-dup loser and only passes quality+lang survivors") {
    val survivors = Curation.curate(docs).select("doc_id").as[Long].collect().toSet
    val losers = TextDedup.minhashLshPairs(docs, 0.5)
      .select("doc_b").as[Long].collect().toSet
    assert(losers.nonEmpty && survivors.intersect(losers).isEmpty)
    assert(survivors.nonEmpty && survivors.size < docs.count())
    // every survivor individually satisfies the quality & language gates
    val meta = TextAnalysis.stats(docs).join(TextAnalysis.langGuess(docs), "doc_id")
      .where(col("quality_score") >= 0.5 && col("lang_guess") === "en")
      .select("doc_id").as[Long].collect().toSet
    assert(survivors.subsetOf(meta))
  }

  test("sourceQuota keeps the k best-quality docs per source, quality DESC with id ties") {
    val d = Seq(
      (1L, "the cat sat of the mat and more words here", "a"),
      (2L, "zz", "a"),
      (3L, "the dog and the cat of the house sat down", "a"),
      (4L, "qq xx", "b"),
      (5L, "", "b") // empty text → NULL quality → ineligible
    ).toDF("doc_id", "text", "source")
    val out = Curation.sourceQuota(d, quota = 2)
      .select("source", "rank", "doc_id").as[(String, Int, Long)].collect().toSeq
    val scores = TextAnalysis.stats(d.select(col("doc_id"), col("text")))
      .select("doc_id", "quality_score").as[(Long, Option[Double])].collect().toMap
    // source a: the two best of {1,2,3}; source b: only doc 4 is eligible
    val bestA = Seq(1L, 2L, 3L).sortBy(id => (-scores(id).get, id)).take(2)
    assert(out == Seq(("a", 1, bestA(0)), ("a", 2, bestA(1)), ("b", 1, 4L)))
    assert(scores(5L).isEmpty)
  }

  test("topFractionThresholds: exact quartile boundary, ties included, small groups keep one") {
    val d = Seq(
      // group "a": 8 rows, top quarter = 2 → threshold = 3rd-highest? no:
      // cum at 90 is 1, at 80 is 3 (tie) → first cum>=2 is 80
      ("a", 90L), ("a", 80L), ("a", 80L), ("a", 70L), ("a", 60L),
      ("a", 50L), ("a", 40L), ("a", 30L),
      // group "b": 2 rows → n/4 = 0 → floor at 1 row → threshold = max
      ("b", 10L), ("b", 5L)
    ).toDF("g", "score")
    val m = Curation.topFractionThresholds(d, "g", "score")
      .select("g", "n_rows", "threshold").as[(String, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(m("a") == (8L, 80L), s"tie at the boundary must be included: $m")
    assert(m("b") == (2L, 10L), s"a tiny group keeps its single best row: $m")
    // rows kept under the threshold rule = top quarter + boundary ties
    val keptA = d.where(col("g") === "a" && col("score") >= m("a")._2).count()
    assert(keptA == 3)
  }
}
