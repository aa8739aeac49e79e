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
}
