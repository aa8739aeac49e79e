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
}
