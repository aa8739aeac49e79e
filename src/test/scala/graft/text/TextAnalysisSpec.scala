package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("stats computes token/char/subword counts and ratios on known input") {
    val docs = Seq((1L, "the cat sat of the mat")).toDF("doc_id", "text")
    val r = TextAnalysis.stats(docs).head()
    assert(r.getAs[Int]("n_chars") == 22)
    assert(r.getAs[Long]("n_tokens") == 6)
    // ceil(len/4) per token: the=1 cat=1 sat=1 of=1 the=1 mat=1 → 6
    assert(r.getAs[Long]("n_subwords") == 6)
    // "the","of","the" are stopwords → 3/6
    assert(r.getAs[Double]("stopword_ratio") == 0.5)
    val q = r.getAs[Double]("quality_score")
    assert(q > 0.0 && q <= 1.0)
  }

  test("langGuess picks the list with most hits, fixed tie order") {
    val docs = Seq(
      (1L, "the cat and a dog of note"),
      (2L, "der hund und die katze das haus"),
      (3L, "el perro y la casa de madrid"),
      (4L, "xyzzy plugh")).toDF("doc_id", "text")
    val out = TextAnalysis.langGuess(docs).select("doc_id", "lang_guess")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "es")
    assert(out(4L) == "en") // zero hits everywhere → tie → first in order
  }

  test("langGuessCjk classifies CJK scripts and falls back to stopwords elsewhere") {
    val docs = Seq(
      (1L, "the cat and a dog of note"),        // latin → stopword path
      (2L, "这是一个中文句子没有假名"),            // Han only → zh
      (3L, "これは日本語の文です"),               // Han + hiragana → ja
      (4L, "한국어 문장입니다 감사합니다"),         // Hangul → ko
      (5L, "the cat 中文 mixed but mostly latin text here")) // minority CJK → stopword path
      .toDF("doc_id", "text")
    val out = TextAnalysis.langGuessCjk(docs).select("doc_id", "lang_final")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "zh")
    assert(out(3L) == "ja")
    assert(out(4L) == "ko")
    assert(out(5L) == "en")
  }

  test("fingerprint is stable and handles short texts") {
    val docs = Seq((1L, "abcdefghij"), (2L, "short"), (3L, "abcdefghij")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(docs).as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(3L))
    assert(fp(2L) > 0)
  }
}
