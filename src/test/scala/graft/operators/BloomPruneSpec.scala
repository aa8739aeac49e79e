package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every dim member passes, at every sketch size") {
    val dim = (0L until 100L).map(v => v * 7).toDF("k")
    val keys = dim.select(col("k").cast("string").as("s"))
    for (m <- Seq(64, 1024, 65536)) {
      val pass = BloomPrune.passingKeys(keys, BloomPrune.bloomBits(dim, "k", m), m)
        .as[String].collect().toSet
      assert(pass == keys.as[String].collect().toSet, s"m=$m dropped a member")
    }
  }

  test("one-sided: the pass set is a superset of the true members") {
    val dim = (0L until 50L).toDF("k")
    val probe = (0L until 500L).map(v => v.toString).toDF("s")
    val pass = BloomPrune.passingKeys(probe, BloomPrune.bloomBits(dim, "k", 256), 256)
      .as[String].collect().toSet
    val members = (0L until 50L).map(_.toString).toSet
    assert(members.subsetOf(pass))
    assert(pass.size < 500, "a 256-bit sketch over 50 keys must reject most non-members")
  }

  test("prunedSemiJoin keeps exactly the rows a later exact join would keep or drop cheaply") {
    val fact = Seq((1L, "a"), (2L, "b"), (3L, "c"), (50L, "x"), (60L, "y"))
      .toDF("fk", "payload")
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val pruned = BloomPrune.prunedSemiJoin(fact, "fk", dim, "k", m = 65536)
      .select("fk").as[Long].collect().toSet
    assert(Set(1L, 2L, 3L).subsetOf(pruned))
    // with m = 65536 over 3 keys, surviving false positives are practically nil
    assert(pruned == Set(1L, 2L, 3L))
  }

  test("bitmap is bounded by ceil(m/60) words regardless of dim size") {
    val dim = (0L until 10000L).toDF("k")
    assert(BloomPrune.bloomBits(dim, "k", m = 1024).count() <= 18)
  }

  // ---- sketch-backed (production-scale) variant ----

  test("sketch bloom: no false negatives — pruned semi-join equals the exact semi-join") {
    val members = (0L until 2000L).map(v => v * 13 + 1)
    val keys = members.toDF("h")
    val bloom = BloomPrune.sketchBloomBytes(keys, "h", members.size.toLong)
    val probe = (0L until 20000L).toDF("h")
    val passed = probe.where(BloomPrune.mightContainLong(bloom, col("h")))
      .as[Long].collect().toSet
    assert(members.filter(_ < 20000L).toSet.subsetOf(passed),
      "a member key was dropped by the sketch — false negative")
    // the prune must actually prune: at fpp=0.01 over 20k probes,
    // non-member passers are ~200, not ~18.5k
    assert(passed.size < 3000, s"sketch rejected too little: ${passed.size}")
    val exact = probe.join(keys, Seq("h"), "left_semi").as[Long].collect().toSet
    val pruned = probe.where(BloomPrune.mightContainLong(bloom, col("h")))
      .join(keys, Seq("h"), "left_semi").as[Long].collect().toSet
    assert(pruned == exact, "bloom-fronted semi-join diverged from the exact one")
  }

  test("sketch bloom: merge (bitmap OR) keeps every member of both sides") {
    val a = (0L until 500L).toDF("h")
    val b = (1000L until 1500L).toDF("h")
    // same geometry on both sides — the streaming maintenance contract
    val cap = 4096L
    val ba = BloomPrune.deserialize(BloomPrune.sketchBloomBytes(a, "h", cap))
    val bb = BloomPrune.deserialize(BloomPrune.sketchBloomBytes(b, "h", cap))
    ba.mergeInPlace(bb)
    val merged = BloomPrune.serialize(ba)
    val union = a.unionByName(b)
    val passed = union.where(BloomPrune.mightContainLong(merged, col("h")))
      .as[Long].collect().toSet
    assert(passed == union.as[Long].collect().toSet,
      "merged sketch dropped a member of one side")
  }
}
