package graft.text

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def shingles(text: String): Set[String] =
    text.split(" ").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
      .map(_.mkString(" ")).toSet

  test("quoted test doc is flagged even when jaccard is tiny (asymmetry)") {
    val quote = "alpha beta gamma delta epsilon"
    val train = Seq((100L, ("padding words " * 30) + quote + (" trailing tokens" * 30)))
      .toDF("doc_id", "text")
    val test = Seq((1L, quote)).toDF("doc_id", "text")
    val got = TextDedup.containmentPairs(test, train, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 100L, 1.0))) // fully contained
    // sanity: the jaccard of that pair is far below 0.5
    val j = shingles(quote).size.toDouble /
      (shingles(("padding words " * 30) + quote + (" trailing tokens" * 30)) ++ shingles(quote)).size
    assert(j < 0.5) // below the 0.5 threshold: jaccard alone would miss this pair
  }

  test("prefix filter has perfect recall vs brute force on random corpora") {
    val word = Gen.oneOf("a", "b", "c", "d", "e", "f", "g")
    val doc = Gen.choose(3, 12).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val gen = for {
      nTest <- Gen.choose(1, 4)
      nTrain <- Gen.choose(1, 6)
      tests <- Gen.listOfN(nTest, doc)
      trains <- Gen.listOfN(nTrain, doc)
    } yield (tests, trains)
    val prop = Prop.forAllNoShrink(gen) { case (tests, trains) =>
      val testDf = tests.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val trainDf = trains.zipWithIndex.map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
      val got = TextDedup.containmentPairs(testDf, trainDf, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        (t, i) <- tests.zipWithIndex
        (r, j) <- trains.zipWithIndex
        st = shingles(t)
        if st.nonEmpty && (st & shingles(r)).size.toDouble / st.size >= 0.5
      } yield (i.toLong, 100L + j)).toSet
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withInitialSeed(Seed(40L)), prop)
    assert(res.passed, res.status.toString)
  }
}
