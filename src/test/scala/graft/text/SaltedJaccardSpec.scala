package graft.text

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The salted multi-pass PPJoin must equal the single-pass operator
  * EXACTLY — same pairs, same jaccard values — at every pass count: the
  * candidate space partitions disjointly by matched prefix token, so
  * passes only re-order work (and duplicate pairs across passes, which
  * the final dropDuplicates collapses). A miss here means the
  * prefix-filter lemma was broken by the slicing (e.g. slicing the SET
  * instead of the prefix table). */
class SaltedJaccardSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // near-identical pair (high jaccard)
    (1L, "a b c d e f g h i j k l"),
    (2L, "a b c d e f g h i j k m"),
    // exact duplicate pair
    (3L, "p q r s t u v w x y z a"),
    (4L, "p q r s t u v w x y z a"),
    // unrelated
    (5L, "m n o p q r s t u a b c"),
    (6L, "z y x w v u t s r q p o"),
    // short doc contained in a longer one (jaccard low — must NOT pair)
    (7L, "a b c d e"),
    (8L, "a b c d e f g h i j k l m n o p q r s t u v w x y z")
  ).toDF("doc_id", "text")

  private def run(passes: Int): Seq[(Long, Long, Double)] = {
    val out = Files.createTempDirectory(s"salted-jac-$passes").toString
    TextDedup.ngramJaccardPairsSalted(
        TextDedup.hashedShingleSets(docs), out, threshold = 0.5, passes = passes)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSeq
  }

  test("salted passes equal the single-pass operator exactly (P = 1, 3, 8)") {
    val single = TextDedup.ngramJaccardPairs(docs, threshold = 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(single.nonEmpty, "fixture must produce at least one pair")
    assert(run(1) === single)
    assert(run(3) === single)
    assert(run(8) === single) // more passes than distinct prefix toks per pair
    assert(run(0) === single) // AUTO: corpus-sized pass count, same law
  }

  test("auto pass count scales with the corpus and clamps to [1, 16]") {
    // below one slice (r15): auto runs the SINGLE-PASS fast path — no
    // pass directories land at all (the decomposition's parquet
    // round-trip is skipped; P ≥ 2 stays pinned by the equality test
    // above and the sf10 gate's 8-pass run)
    val out = Files.createTempDirectory("salted-jac-auto").toString
    TextDedup.ngramJaccardPairsSalted(
      TextDedup.hashedShingleSets(docs), out, threshold = 0.5).count()
    assert(!Files.isDirectory(java.nio.file.Paths.get(s"$out/pass=0")),
      "auto below one slice must skip the pass landing entirely")
    // the sizing rule itself (pure arithmetic of the operator's clamp)
    def auto(n: Long): Int = math.max(1, math.min(16,
      ((n + TextDedup.SaltedSliceDocs - 1) / TextDedup.SaltedSliceDocs).toInt))
    assert(auto(5000) === 1)      // bench scale: single-pass fast path
    assert(auto(500000) === 8)    // sf10: the measured 8-pass form
    assert(auto(5000000) === 16)  // clamp: wall-clock stays bounded
  }

  test("pass outputs partition by matched token, union covers every pair") {
    // a pair sharing prefix tokens in several slices appears in several
    // pass files with the SAME jaccard — the duplicate-collapse rule is
    // dropDuplicates, never sum/merge
    val out = Files.createTempDirectory("salted-jac-dup").toString
    TextDedup.ngramJaccardPairsSalted(
      TextDedup.hashedShingleSets(docs), out, threshold = 0.5, passes = 4).count()
    val raw = spark.read.parquet((0 until 4).map(p => s"$out/pass=$p"): _*)
    val dups = raw.groupBy("doc_a", "doc_b", "jaccard").count()
    assert(raw.count() >= dups.count(), "cross-pass duplicates are expected")
    assert(dups.groupBy("doc_a", "doc_b").count().where(col("count") > 1).count() === 0,
      "a pair must carry ONE jaccard value across all passes")
  }
}
