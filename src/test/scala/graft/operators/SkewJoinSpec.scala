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
}
