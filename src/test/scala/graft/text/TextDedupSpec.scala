package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def corpusDocs =
    spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))

  test("exact dedup keeps min doc_id per text with copy counts") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta"),
      (7L, "alpha beta gamma")).toDF("doc_id", "text")
    assertSameRows(
      TextDedup.exact(docs).select(col("doc_id").cast("string"), col("n_copies").cast("string")),
      Seq(Seq("1", "3"), Seq("3", "1")))
  }

  test("normalized dedup unifies case/punct/whitespace variants") {
    val docs = Seq(
      (1L, "Hello,  World!"),
      (2L, "hello world"),
      (3L, "HELLO ... world  "),
      (4L, "different text entirely")).toDF("doc_id", "text")
    val out = TextDedup.normalized(docs)
    assert(out.count() == 2)
    assert(out.where(col("doc_id") === 1).select("n_copies").as[Long].head() == 3)
  }

  test("minhash LSH pairs == brute-force jaccard pairs on the corpus (perfect recall here)") {
    val docs = corpusDocs
    val lsh = TextDedup.minhashLshPairs(docs, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

    // Ground truth: all-pairs exact jaccard (test-only; never a prod path)
    val sh = docs.withColumn("sh", TextDedup.shingleExpr("text")).select("doc_id", "sh")
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val truth = a.crossJoin(b).where(col("doc_a") < col("doc_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("j", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
      .where(col("j") >= 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

    assert(truth.nonEmpty, "corpus should contain near-duplicates")
    assert(lsh == truth, s"LSH missed ${truth.diff(lsh)} / extra ${lsh.diff(truth)}")
  }

  test("incremental (new × old) pairs == full-corpus pairs restricted to cross-set") {
    val docs = corpusDocs
    val isNew = (id: Long) => id % 10 == 7
    val between = TextDedup.minhashLshPairsBetween(
        docs.where(pmod(col("doc_id"), lit(10)) === 7),
        docs.where(pmod(col("doc_id"), lit(10)) =!= 7))
      .select("new_id", "old_id").as[(Long, Long)].collect().toSet
    val full = TextDedup.minhashLshPairs(docs, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val expected = full.collect {
      case (a, b) if isNew(a) && !isNew(b) => (a, b)
      case (a, b) if !isNew(a) && isNew(b) => (b, a)
    }
    assert(expected.nonEmpty, "cross-set near-duplicates should exist")
    assert(between == expected,
      s"missed ${expected.diff(between)} / extra ${between.diff(expected)}")
  }

  test("probing a maintained band artifact equals re-banding the corpus per batch") {
    // the production incremental form (corpus side = landed capped band
    // table) must be ROW-EQUAL to the re-banding form it replaces —
    // the annIvfNewAgainstAssigned discipline applied to near-dup
    val docs = corpusDocs
    val shNew = TextDedup.shingled(docs.where(pmod(col("doc_id"), lit(10)) === 7))
    val shOld = TextDedup.shingled(docs.where(pmod(col("doc_id"), lit(10)) =!= 7))
    val artifact = TextDedup.bandSignatures(shOld, TextDedup.LshMaxBucket)
    assertSameRows(
      TextDedup.minhashLshPairsBetweenAgainstBands(shNew, artifact, shOld),
      rowsOf(TextDedup.minhashLshPairsBetweenFromShingles(shNew, shOld)))
  }

  test("prefix-filtered ngram jaccard == brute-force jaccard pairs (exact, with scores)") {
    val docs = corpusDocs
    val got = TextDedup.ngramJaccardPairs(docs, threshold = 0.5)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet

    val sh = docs.withColumn("sh", TextDedup.shingleExpr("text")).select("doc_id", "sh")
    val truth = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      .crossJoin(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .withColumn("j", when(col("uni") > 0,
        col("inter").cast("double") / col("uni").cast("double")))
      .where(col("j") >= 0.5)
      .select("doc_a", "doc_b", "j").as[(Long, Long, Double)].collect().toSet

    assert(truth.nonEmpty, "corpus should contain near-duplicates")
    assert(got == truth, s"prefix filter missed ${truth.diff(got)} / extra ${got.diff(truth)}")
  }

  test("prefix filter keeps recall at a non-dyadic threshold (0.7)") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i k"),   // high overlap with 1
      (3L, "z y x w v u t s r q"),
      (4L, "completely different text here now ok")).toDF("doc_id", "text")
    val sh = docs.withColumn("sh", TextDedup.shingleExpr("text")).select("doc_id", "sh")
    val truth = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      .crossJoin(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("j", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
      .where(col("j") >= 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val got = TextDedup.ngramJaccardPairs(docs, threshold = 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == truth)
  }

  test("simhash neardup candidates have perfect recall at hamming<=3 (pigeonhole)") {
    val docs = corpusDocs
    val banded = TextDedup.simhashNearDup(docs, maxHam = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val fp = TextDedup.simhashFingerprints(docs)
    val a = fp.select(col("doc_id").as("doc_a"), col("simhash").as("sa"))
    val b = fp.select(col("doc_id").as("doc_b"), col("simhash").as("sb"))
    val truth = a.crossJoin(b).where(col("doc_a") < col("doc_b"))
      .where(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(banded == truth)
  }

  test("dupGramCoverage counts corpus-repeated shingles per doc") {
    val docs = Seq(
      (1L, "a b c d"),     // shingles {a b c, b c d}; "a b c" shared with d2
      (2L, "a b c x"),     // shingles {a b c, b c x}
      (3L, "z z z z z"),   // one distinct shingle, unique to d3
      (4L, "q")            // too short for a 3-gram
    ).toDF("doc_id", "text")
    val out = TextDedup.dupGramCoverage(docs)
      .select("doc_id", "n_shingles", "n_dup", "dup_ratio")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, 0.5),
      (2L, 2L, 1L, 0.5),
      (3L, 1L, 0L, 0.0),
      (4L, 0L, 0L, 0.0)))
  }

  test("minhashCalibration: identical docs land in decile 10 with zero error") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "totally different words here now")).toDF("doc_id", "text")
    val out = TextDedup.minhashCalibration(docs)
      .select("decile", "n_pairs", "sum_abs_err_ppm", "mean_abs_err_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // only the identical pair band-collides: est = 16/16, true = 1.0
    assert(out == Seq((10L, 1L, 0L, 0L)))
  }

  test("minhashCalibration errors are bounded by 1e6 ppm on corpus data") {
    val out = TextDedup.minhashCalibration(corpusDocs)
      .select("decile", "n_pairs", "mean_abs_err_ppm")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    assert(out.forall { case (d, n, e) => d >= 0 && d <= 10 && n > 0 && e >= 0 && e <= 1000000 })
    assert(out.map(_._1) == out.map(_._1).sorted)
  }

  test("band-bucket cap keeps only the cap smallest ids per bucket") {
    // five byte-identical docs are ONE exact group since r14 (exact
    // dedup BEFORE near-dup): the rep bands alone and the duplicate
    // relations surface as star edges — no cap can drop them, where
    // raw banding used to lose (1,3),(1,5),(1,9),(2,3)… to a cap of 2
    val docs = Seq(1L, 2L, 3L, 5L, 9L)
      .map(id => (id, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val stars = Set((1L, 2L), (1L, 3L), (1L, 5L), (1L, 9L))
    val capped = TextDedup.minhashLshPairs(docs, threshold = 0.5, maxBucket = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped == stars, "group stars must be cap-invariant")
    val full = TextDedup.minhashLshPairs(docs, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(full == stars)
    // the cap itself still binds the RAW banding primitive (the capped
    // signature artifact's mechanics): cap=2 keeps ids {1, 2} in every
    // bucket, so the only raw candidate — and pair — is (1, 2)
    val raw = TextDedup.minhashLshPairsFromShingles(
        TextDedup.shingled(docs).cache(), threshold = 0.5, maxBucket = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(raw == Set((1L, 2L)))
  }

  test("default cap never fires on the sf0.001 corpus (capped == uncapped)") {
    val docs = corpusDocs
    val capped = TextDedup.minhashLshPairs(docs, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val uncapped = TextDedup.minhashLshPairs(docs, threshold = 0.5,
        maxBucket = Int.MaxValue)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped == uncapped)
  }

  test("between-pairs cap applies per side") {
    // old bucket {1,2,3,4} capped to {1,2}; new bucket {101,102,103}
    // capped to {101,102} — bipartite candidates are the 2×2 product
    val text = "alpha beta gamma delta epsilon"
    val oldDocs = Seq(1L, 2L, 3L, 4L).map(id => (id, text)).toDF("doc_id", "text")
    val newDocs = Seq(101L, 102L, 103L).map(id => (id, text)).toDF("doc_id", "text")
    val got = TextDedup.minhashLshPairsBetween(newDocs, oldDocs, maxBucket = 2)
      .select("new_id", "old_id").as[(Long, Long)].collect().toSet
    assert(got == Set((101L, 1L), (101L, 2L), (102L, 1L), (102L, 2L)))
  }

  test("occupancy audit quantifies the capped/dropped candidate mass") {
    val docs = Seq(1L, 2L, 3L, 5L, 9L)
      .map(id => (id, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val out = TextDedup.bandOccupancyAudit(docs, maxBucket = 2)
      .select("band", "n_buckets", "max_bucket", "cand_pairs",
        "capped_pairs", "dropped_pairs", "dropped_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.size == 8)
    // per band: one bucket of 5 → 10 raw pairs, 1 capped pair, 9 dropped
    out.foreach { case (_, nb, mb, cp, kp, dp, ppm) =>
      assert((nb, mb, cp, kp, dp, ppm) == ((1L, 5L, 10L, 1L, 9L, 900000L)))
    }
  }
}
