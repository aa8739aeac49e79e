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

  // ---- epochShuffle (q159) ----

  private val ids = (0L until 100L).toDF("doc_id")

  test("epochShuffle is a permutation: pos covers 0..n-1 exactly once") {
    val out = Sampling.epochShuffle(ids)
      .select("pos").as[Long].collect().sorted.toSeq
    assert(out == (0L until 100L))
  }

  test("epochShuffle equals the naive global hash-rank (bucket decomposition exact)") {
    val naive = (0L until 100L)
      .sortBy(id => (PortableHash.h60jvm(s"ep:1:$id"), id))
      .zipWithIndex.map { case (id, i) => (id, i.toLong) }.toMap
    val got = Sampling.epochShuffle(ids)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(got == naive)
    // worker is pos mod 8
    val w = Sampling.epochShuffle(ids)
      .select("pos", "worker").as[(Long, Long)].collect()
    assert(w.forall { case (p, wk) => wk == p % 8 })
  }

  test("bucketBits does not change the permutation; epochs are independent orders") {
    val a = Sampling.epochShuffle(ids, bucketBits = 2)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    val b = Sampling.epochShuffle(ids, bucketBits = 14)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(a == b)
    val e2 = Sampling.epochShuffle(ids, epoch = 2)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(e2 != a) // two epochs agreeing on all 100 positions ≈ impossible
    assert(e2.values.toSeq.sorted == (0L until 100L)) // still a permutation
  }
}
