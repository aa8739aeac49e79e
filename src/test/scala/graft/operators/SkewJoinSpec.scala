package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on a hot-key distribution") {
    // 10k rows of one hot key + a long tail
    val big = (1 to 10000).map(i => ("hot", i)).++((1 to 100).map(i => (s"k$i", i)))
      .toDF("key", "v")
    val small = (Seq("hot") ++ (1 to 100).map(i => s"k$i")).zipWithIndex
      .toDF("key", "w")

    val plain = big.join(small, Seq("key")).select("key", "v", "w")
    val salted = SkewJoin.salted(big, small, Seq("key")).select("key", "v", "w")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("the hot key's rows actually spread across salt buckets") {
    val big = (1 to 5000).map(i => ("hot", i)).toDF("key", "v")
    val buckets = big.withColumn("salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(16)).cast("int"))
      .select("salt").distinct().count()
    assert(buckets > 8, s"expected the hot key spread over many buckets, got $buckets")
  }

  test("audited salted join equals the plain join; cold keys are not replicated") {
    // one melting key (10k), one warm key (60 ≈ 3× median), long tail at 1–2
    val big = ((1 to 10000).map(_ => ("hot", 1)) ++ (1 to 60).map(_ => ("warm", 2)) ++
      (1 to 100).flatMap(i => Seq((s"k$i", 3), (s"k$i", 4)))).toDF("key", "v")
    val small = (Seq("hot", "warm", "miss") ++ (1 to 100).map(i => s"k$i"))
      .zipWithIndex.toDF("key", "w")

    val plain = big.join(small, Seq("key")).select("key", "v", "w")
    val audited = SkewJoin.saltedAudited(big, small, Seq("key")).select("key", "v", "w")
    assert(audited.count() == plain.count())
    assert(audited.exceptAll(plain).isEmpty && plain.exceptAll(audited).isEmpty)
  }

  test("audited salting accepts a precomputed (stale) audit and stays exact") {
    val big = ((1 to 1000).map(_ => ("hot", 1)) ++ (1 to 10).map(i => (s"k$i", 2)))
      .toDF("key", "v")
    val small = (Seq("hot") ++ (1 to 10).map(i => s"k$i")).zipWithIndex.toDF("key", "w")
    // deliberately wrong counts: lists a cold key as hot, misses 'hot'
    val staleAudit = Seq(("k3", 7)).toDF("key", "__buckets")
    val plain = big.join(small, Seq("key")).select("key", "v", "w")
    val audited = SkewJoin.saltedAudited(big, small, Seq("key"),
      precomputedHot = Some(staleAudit)).select("key", "v", "w")
    assert(audited.exceptAll(plain).isEmpty && plain.exceptAll(audited).isEmpty)
  }
}
