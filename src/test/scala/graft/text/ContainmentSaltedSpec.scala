package graft.text

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The salted multi-pass containment join must equal the single-pass
  * operator EXACTLY — same pairs, same containment values — at every
  * pass count: candidates partition disjointly by the matched token, so
  * passes only re-order work (and duplicate pairs across passes, which
  * the final dropDuplicates collapses). A miss here means the
  * containment prefix lemma was broken by the slicing (e.g. slicing the
  * test doc's SET instead of its prefix projection, which could drop
  * the one guaranteed-shared prefix shingle from a pass). */
class ContainmentSaltedSpec extends SparkSpec {
  import spark.implicits._

  // test split = doc_id % 10 == 0 (q40's rule); trains carry the tests'
  // text verbatim (contained: high containment, low jaccard) or not
  private def docs = Seq(
    (10L, "a b c d e f g"),                                   // test, contained in 1
    (20L, "p q r s t u v w"),                                 // test, contained in 2
    (30L, "z z1 z2 z3 z4 z5 z6"),                             // test, unrelated
    (1L, "a b c d e f g h i j k l m n o p q r s t"),          // train ⊇ 10
    (2L, "x y p q r s t u v w k2 k3 k4 k5 k6 k7"),            // train ⊇ 20
    (3L, "m n o m2 n2 o2 m3 n3 o3 m4 n4 o4"),                 // train, unrelated
    (4L, "a b c d e f g")                                     // train ≡ 10 exactly
  ).toDF("doc_id", "text")

  private def split(df: org.apache.spark.sql.DataFrame) = (
    TextDedup.hashedShingleSets(df.where(col("doc_id") % 10 === 0)),
    TextDedup.hashedShingleSets(df.where(col("doc_id") % 10 =!= 0)))

  private def run(passes: Int): Seq[(Long, Long, Double)] = {
    val (te, tr) = split(docs)
    val out = Files.createTempDirectory(s"salted-con-$passes").toString
    TextDedup.containmentPairsSalted(te, tr, out, threshold = 0.5, passes = passes)
      .select(col("test_id"), col("train_id"), col("containment"))
      .as[(Long, Long, Double)].collect().toSeq
  }

  test("salted passes equal the single-pass operator exactly (P = 1, 3, 8, auto)") {
    val (te, tr) = split(docs)
    val single = TextDedup.containmentPairsFromHashsets(te, tr, threshold = 0.5)
      .select(col("test_id"), col("train_id"), col("containment"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(single.nonEmpty, "fixture must produce at least one contaminated pair")
    assert(single.exists { case (t, _, c) => t == 10L && c == 1.0 },
      "fixture must include a fully-contained test doc")
    assert(!single.exists { case (t, _, _) => t == 30L },
      "the unrelated test doc must not pair")
    assert(run(1) === single)
    assert(run(3) === single)
    assert(run(8) === single) // more passes than shared prefix toks per pair
    assert(run(0) === single) // AUTO: corpus-sized pass count, same law
  }

  test("pass outputs partition by matched token, union covers every pair") {
    val (te, tr) = split(docs)
    val out = Files.createTempDirectory("salted-con-dup").toString
    TextDedup.containmentPairsSalted(te, tr, out, threshold = 0.5, passes = 4).count()
    val raw = spark.read.parquet((0 until 4).map(p => s"$out/pass=$p"): _*)
    val dups = raw.groupBy("test_id", "train_id", "containment").count()
    assert(raw.count() >= dups.count(), "cross-pass duplicates are expected")
    assert(dups.groupBy("test_id", "train_id").count().where(col("count") > 1).count() === 0,
      "a pair must carry ONE containment value across all passes")
  }
}
