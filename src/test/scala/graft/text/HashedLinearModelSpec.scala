package graft.text

import graft.SparkSpec
import graft.functions.PortableHash

class HashedLinearModelSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: Seq[(Long, String)]): Map[Long, (Long, Long, Int)] =
    HashedLinearModel.score(texts.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap

  /** Driver-side replay of the bucket → weight derivation. */
  private def weight(feature: String): Long = {
    val bucket = PortableHash.h28jvm(feature) % HashedLinearModel.NBuckets
    PortableHash.h28jvm(s"w:$bucket") % HashedLinearModel.WSpan - 1000L
  }

  test("logit is the exact sum of unigram and bigram milli-weights") {
    val text = "the quick brown fox"
    val feats = Seq("the", "quick", "brown", "fox",
      "the quick", "quick brown", "brown fox")
    val expected = feats.map(weight).sum
    val got = run(Seq(1L -> text))
    assert(got(1L) == ((7L, expected, if (expected >= 0) 1 else 0)))
  }

  test("empty and single-token docs have no bigrams; empty doc scores zero") {
    val got = run(Seq(1L -> "", 2L -> "hello"))
    assert(got(1L) == ((0L, 0L, 1)))
    assert(got(2L) == ((1L, weight("hello"), if (weight("hello") >= 0) 1 else 0)))
  }

  test("repeated tokens count per occurrence (tf, not distinct)") {
    val one = run(Seq(1L -> "spam"))(1L)._2
    val got = run(Seq(1L -> "spam spam"))
    assert(got(1L)._2 == 2 * one + weight("spam spam"))
  }
}
