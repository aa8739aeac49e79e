package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The corpus carries no within-doc repeated sentences (q100 measures
  * all-zero), so q121's oracle gate never exercises the removal
  * branch — these goldens pin it on synthetic docs. */
class RepetitionScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(rows: (Long, String)*) =
    TextAnalysis.scrubRepeatedSentences(rows.toDF("doc_id", "text"))
      .orderBy("doc_id")
      .select("doc_id", "n_sents", "n_removed", "scrub_md5")
      .as[(Long, Int, Int, String)].collect()

  test("repeated sentences drop; first occurrence and order survive") {
    val Array(r) = scrub((1L, "a b. c d. a b. e f. c d"))
    assert(r._2 == 5 && r._3 == 2)
    // reconstruction keeps first occurrences in original order
    val expected = spark.sql("SELECT md5('a b. c d. e f')").head().getString(0)
    assert(r._4 == expected, "scrubbed text must be 'a b. c d. e f'")
  }

  test("a doc that is one sentence repeated collapses to that sentence") {
    val Array(r) = scrub((2L, "x y. x y. x y"))
    assert(r._2 == 3 && r._3 == 2)
    assert(r._4 == spark.sql("SELECT md5('x y')").head().getString(0))
  }

  test("no repeats → identity: zero removed, text rejoin unchanged") {
    val Array(r) = scrub((3L, "p q. r s. t u"))
    assert(r._2 == 3 && r._3 == 0)
    assert(r._4 == spark.sql("SELECT md5('p q. r s. t u')").head().getString(0))
  }

  test("null text rows are dropped, not crashed on") {
    val out = TextAnalysis.scrubRepeatedSentences(
      Seq((4L, null: String), (5L, "ok then")).toDF("doc_id", "text"))
    assert(out.count() == 1)
  }
}
