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

  test("codeSwitch flags a half-German doc and clears monolingual ones") {
    val docs = Seq(
      // doc 1: two en sentences, two de sentences → doc votes by total
      // hits (de 6 vs en 5 → 'de'), the two en sentences disagree
      (1L, "the cat of the house. a dog and more. der hund und die katze. das und der haus."),
      // doc 2: monolingual en
      (2L, "the cat sat. a dog and the bird."),
      // doc 3: empty text → no sentences → dropped
      (3L, ""),
      (4L, "el gato y la casa. el perro y la luz.")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.codeSwitch(docs)
      .select("doc_id", "doc_lang", "n_sents", "n_switched", "mixed_ppm")
      .as[(Long, String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == "de" && out(1L)._3 == 4 && out(1L)._4 == 2 &&
      out(1L)._5 == 500000L, s"mixed doc mis-scored: ${out(1L)}")
    assert(out(2L)._4 == 0 && out(2L)._5 == 0L)
    assert(!out.contains(3L), "empty doc must drop (no language evidence)")
    assert(out(4L)._2 == "es" && out(4L)._4 == 0)
  }

  test("fingerprint is stable and handles short texts") {
    val docs = Seq((1L, "abcdefghij"), (2L, "short"), (3L, "abcdefghij")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(docs).as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(3L))
    assert(fp(2L) > 0)
  }
}
