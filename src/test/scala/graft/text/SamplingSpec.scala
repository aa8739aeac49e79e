package graft.text

import graft.SparkSpec
import graft.functions.PortableHash

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, "en"), (2L, "en"), (3L, "en"), (4L, "en"), (5L, "en"),
    (6L, "de"), (7L, "de"), (8L, "fr")).toDF("doc_id", "lang")

  test("takes exactly min(k, stratum size) per stratum, ranks 1..n") {
    val got = Sampling.stratifiedHashSample(df, "lang", "doc_id", 3)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2)))
    val byLang = got.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    assert(byLang == Map("en" -> Seq(1, 2, 3), "de" -> Seq(1, 2), "fr" -> Seq(1)))
  }

  test("selection follows (h60(key), key) order — engine-independent, not input order") {
    val got = Sampling.stratifiedHashSample(df, "lang", "doc_id", 2)
      .collect().filter(_.getString(1) == "en").sortBy(_.getInt(2)).map(_.getLong(0)).toSeq
    val expected = Seq(1L, 2L, 3L, 4L, 5L)
      .sortBy(id => (PortableHash.h60jvm(id.toString), id)).take(2)
    assert(got == expected)
  }

  test("deterministic across invocations") {
    def run() = Sampling.stratifiedHashSample(df, "lang", "doc_id", 2)
      .collect().map(r => (r.getString(1), r.getInt(2), r.getLong(0))).sorted.toSeq
    assert(run() == run())
  }
}
