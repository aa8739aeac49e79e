package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge inputs the corpus never exercises: empty text, single word,
  * sub-shingle length, whitespace runs. The operators must stay total
  * (no throw, no surprise null rows) — at 100 TB every pathological
  * document shape exists somewhere. */
class TextEdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val edge = Seq(
    (1L, Option("")),                 // empty
    (2L, Option("word")),             // single token, shorter than a char 8-gram
    (3L, Option("two words")),        // below shingle width
    (4L, Option("   ")),              // whitespace only
    (5L, Option("a b c d e f g h")),
    (6L, Option.empty[String]))       // NULL text — must behave like empty
    .toDF("doc_id", "text")

  test("dedup operators are total on degenerate texts") {
    assert(TextDedup.exact(edge).count() == 6) // NULL text groups alone
    assert(TextDedup.normalized(edge).count() == 5) // "" and "   " normalize equal
    // no shingles → no candidates → empty pair sets, not errors
    assert(TextDedup.minhashLshPairs(edge.where(col("doc_id") <= 4)).count() == 0)
    val fp = TextDedup.simhashFingerprints(edge).as[(Long, Long)].collect().toMap
    assert(fp(1L) == 0L) // empty shingle set → simhash 0
    // NULL text must coalesce to the empty shingle set (the CASE-shaped
    // SQL's and the DuckDB oracle's behavior), not a NULL simhash —
    // round-3 review finding on the native word_shingles rewrite
    assert(fp(6L) == 0L)
    // whitespace-only text yields whitespace shingles — defined (and
    // identical in the oracle), just not meaningful; deterministic:
    assert(fp(4L) == TextDedup.simhashFingerprints(edge).as[(Long, Long)].collect().toMap.apply(4L))
  }

  test("stats and fingerprints stay defined (nulls only where ratios are 0/0)") {
    val s = TextAnalysis.stats(edge).collect().map(r =>
      r.getAs[Long]("doc_id") -> r).toMap
    assert(s(2L).getAs[Long]("n_tokens") == 1)
    assert(s(1L).getAs[Long]("n_tokens") == 0)
    assert(s(1L).isNullAt(s(1L).fieldIndex("alpha_ratio"))) // 0-length division
    val fRows = TextAnalysis.fingerprint(edge).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(fRows(2L).exists(_ > 0)) // short-text fallback hash
    assert(fRows(6L).isEmpty) // NULL text → NULL fingerprint (SQL convention)
    // only doc 5 (15 chars → 8 grams → exactly one full 8-window) winnows
    val w = TextAnalysis.winnow(edge).select("doc_id").as[Long].collect().toSeq
    assert(w == Seq(5L))
  }

  test("round-6 operators are total on degenerate texts") {
    // bm25: no doc contains a query term → empty ranking, not an error
    assert(TextAnalysis.bm25(edge, Seq("zzz_absent")).count() == 0)
    // NULL/empty/whitespace texts contribute no tokens; doc 5 matches
    val b = TextAnalysis.bm25(edge, Seq("a", "b")).select("doc_id").as[Long].collect()
    assert(b.toSeq == Seq(5L))
    // dupGramCoverage: every doc with a non-NULL text gets a row;
    // sub-shingle docs report 0/0 shingles with ratio 0.0
    val cov = TextDedup.dupGramCoverage(edge).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(cov(2L) == ((0L, 0L, 0.0)))
    assert(cov(5L)._1 > 0 && cov(5L)._2 == 0) // unique shingles, no dups
    // phraseSearch: absent phrase → empty; NULL text never matches
    assert(InvertedIndex.phraseSearch(edge, Seq("zz", "yy")).count() == 0)
    assert(InvertedIndex.phraseSearch(edge, Seq("a", "b"))
      .as[(Long, Long)].collect().toSeq == Seq((5L, 1L)))
  }
}
