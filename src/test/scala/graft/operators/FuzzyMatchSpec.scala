package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FuzzyMatchSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
    FuzzyMatch.firstToken, FuzzyMatch.lastToken)

  private val rows = Seq(
    "red widget", "red widget", "red widgit", // typo in the LAST token: only
                                              // the first-token pass finds it
    "hot widget",                              // dist 3 from "red widget"
    "small ring", "red ring",                  // dist 5 — beyond threshold
    "lone bolt").toDF("p_name")

  test("multi-pass blocking finds pairs whose typo falls inside one key") {
    val got = FuzzyMatch.blockedPairs(rows, "p_name", keys, 3)
      .orderBy("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("hot widget", "red widget", 3, 1L, 2L),   // shared last token
      ("red widget", "red widgit", 1, 2L, 1L)))  // shared FIRST token only
  }

  test("results equal brute force restricted to any-shared-block pairs") {
    val reg = rows.distinct()
      .withColumn("b1", FuzzyMatch.firstToken(col("p_name")))
      .withColumn("b2", FuzzyMatch.lastToken(col("p_name")))
    val brute = reg.as("a").join(reg.as("b"),
        (col("a.b1") === col("b.b1") || col("a.b2") === col("b.b2"))
          && col("a.p_name") < col("b.p_name"))
      .where(levenshtein(col("a.p_name"), col("b.p_name")) <= 3)
      .select(col("a.p_name"), col("b.p_name"))
    val got = FuzzyMatch.blockedPairs(rows, "p_name", keys, 3)
      .select("name_a", "name_b")
    assert(rowsOf(got) == rowsOf(brute))
  }

  test("candidates deduped across passes: no pair is emitted twice") {
    // "red widget"/"red ring" share the first token; "red widget"/"hot
    // widget" share the last; "red widget"/"red widgit" share the first —
    // raise the threshold so everything passes and count emissions.
    val all = FuzzyMatch.blockedPairs(rows, "p_name", keys, 100)
    assert(all.count() == all.select("name_a", "name_b").distinct().count())
  }

  test("support counts reflect raw-row multiplicity, not registry rows") {
    val got = FuzzyMatch.blockedPairs(rows, "p_name", keys, 1).collect()
    assert(got.length == 1)
    assert(got.head.getLong(3) == 2L && got.head.getLong(4) == 1L)
  }

  test("threshold 0 yields nothing from a distinct registry") {
    assert(FuzzyMatch.blockedPairs(rows, "p_name", keys, 0).count() == 0L)
  }
}
