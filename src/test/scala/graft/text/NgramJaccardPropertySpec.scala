package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** Property: prefix-filtered n-gram jaccard equals brute force for ANY
  * corpus and threshold — the prefix-filter + positional-filter + length
  * -filter stack must never lose a pair. Small shared vocabulary forces
  * heavy shingle overlap. Seeded for reproducibility. */
class NgramJaccardPropertySpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")

  private val corpusGen: Gen[(List[String], Double)] = for {
    n <- Gen.choose(2, 12)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 12)
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
    t <- Gen.oneOf(0.3, 0.5, 0.8)
  } yield (docs, t)

  test("property: prefix-filtered pairs == brute force for any corpus and threshold") {
    val prop = Prop.forAllNoShrink(corpusGen) { case (texts, t) =>
      val docs = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
      val got = TextDedup.ngramJaccardPairs(docs, threshold = t)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val sh = docs.withColumn("sh", TextDedup.shingleExpr("text")).select("doc_id", "sh")
      val ref = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
        .crossJoin(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")))
        .where(col("doc_a") < col("doc_b"))
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
        .withColumn("j", when(col("uni") > 0,
          col("inter").cast("double") / col("uni").cast("double")))
        .where(col("j") >= t)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      got == ref
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withInitialSeed(Seed(11L)), prop)
    assert(res.passed, res.status.toString)
  }
}
