package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitLeakageSpec extends SparkSpec {
  import spark.implicits._

  private def isTest(id: Long): Boolean = spark.sql(
    s"SELECT md5_prefix(concat('sp:', cast(${id}L as string)), 15) % 100"
  ).head().getLong(0) < 10

  test("straddling pairs mark exactly the test-side endpoints, per source") {
    // ids chosen at runtime so the fixture always contains BOTH sides
    // of the hash split (hash constants may change; expectations replay)
    val ids = (1L to 60L)
    val split = ids.map(i => i -> isTest(i)).toMap
    val someTest = ids.filter(split)
    val someTrain = ids.filterNot(split)
    assume(someTest.nonEmpty && someTrain.nonEmpty)

    val docs = ids.map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "source")
    // pairs: one straddling (test t0 ~ train r0), one train-only
    // (r1 ~ r2), one test-only (t1 ~ t2) when available
    val t = someTest.take(3); val r = someTrain.take(3)
    val pairRows = Seq((t(0), r(0))) ++
      (if (r.length >= 3) Seq((r(1), r(2))) else Nil) ++
      (if (t.length >= 3) Seq((t(1), t(2))) else Nil)
    val pairs = pairRows.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("doc_a", "doc_b")

    val out = Curation.splitLeakage(docs, pairs)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(row => row._1 -> row).toMap

    // only the straddling pair contaminates, and only its TEST end
    val contaminated = Set(t(0))
    for (src <- Seq("a", "b")) {
      val srcIds = ids.filter(i => (if (i % 2 == 0) "a" else "b") == src)
      val nTest = srcIds.count(split)
      val nTrain = srcIds.size - nTest
      val nCont = srcIds.count(i => contaminated(i) && split(i))
      val (_, gTrain, gTest, gCont, gPpm) = out(src)
      assert(gTrain == nTrain && gTest == nTest, src)
      assert(gCont == nCont, src)
      assert(gPpm == (if (nTest > 0) nCont * 1000000L / nTest else 0L), src)
    }
    // train-only and test-only pairs contaminated nothing extra
    assert(out.values.map(_._4).sum == 1L)
  }
}
