package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** Degenerate-input fuzz for the release chain — the r11 lesson made a
  * suite: both bugs found by review that round (DSIR ppb underflow, the
  * overwriteSwap absent-path window) were BOUNDARY conditions, invisible
  * on the well-behaved gate corpora. This spec drives the full chain
  * (grams → pairs → closure → quality → survivors → gate → mixture →
  * sample → pack → card/diff) over adversarial corpora — empty, one-doc,
  * all-duplicate, sub-gram-width, zero-releasable — plus ScalaCheck
  * random corpora from a tiny vocabulary (forcing heavy duplication),
  * asserting no-crash and the chain's arithmetic invariants:
  *
  *  - card completeness: one row per RAW source, even when a source
  *    loses every doc to a stage (zeroed, never omitted);
  *  - stage monotonicity per source: n_released ≤ n_gated ≤
  *    n_survivors ≤ n_docs_raw;
  *  - token accounting: 0 ≤ kept_tokens ≤ n_tokens on every survivor;
  *  - decision determinism (the JVM-side oracle): releaseDiff with
  *    `isNew = false` compares the SAME decision layer to itself —
  *    added/removed must be 0 and prev ≡ cur columns byte-equal; with
  *    `isNew = true` the prev side must be exactly zero.
  */
class DegenerateCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "source", "text")

  /** The warehouse's artifact recipes, applied to an in-memory corpus. */
  private def artifacts(docs: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val grams = graft.text.SegmentDedup.gramOccurrences(
      docs.select(col("doc_id"), col("text")))
    val pairs = graft.text.TextDedup.minhashLshPairs(
      docs.select(col("doc_id"), col("text")))
    val clusters = graft.operators.Components.minLabel(
        docs.select(col("doc_id").as("id")),
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      .select(col("id").as("doc_id"), col("component").as("cluster_id"))
    val quality = graft.text.TextAnalysis.compositeQuality(
      docs.select(col("doc_id"), col("text")))
    (grams, clusters, quality)
  }

  /** Run the whole chain; assert every invariant; return survivor count. */
  private def checkChain(docs: DataFrame): Long = {
    val mixture = docs.select(col("source")).distinct()
      .withColumn("mix_ppm", lit(200000L))
    val (grams, clusters, quality) = artifacts(docs)
    val surv = Release.survivors(docs, grams, clusters, quality)

    // token accounting on every survivor row
    val badTokens = surv.where(col("kept_tokens") < 0 ||
      col("kept_tokens") > col("n_tokens") || col("n_dup_tokens") < 0).count()
    assert(badTokens == 0, "survivor token accounting out of range")

    // card completeness + stage monotonicity
    val card = Release.releaseCard(docs, grams, clusters, quality, mixture).collect()
    val rawSources = docs.select("source").distinct().as[String].collect().toSet
    assert(card.map(_.getString(0)).toSet == rawSources,
      s"card must carry one row per raw source (${card.length} vs ${rawSources.size})")
    card.foreach { r =>
      val (nRaw, nSurv, nGated, nRel) = (r.getLong(1), r.getLong(2),
        r.getLong(4), r.getLong(8))
      assert(nRel <= nGated && nGated <= nSurv && nSurv <= nRaw,
        s"stage monotonicity broken for ${r.getString(0)}: $nRaw/$nSurv/$nGated/$nRel")
      assert(r.getLong(9) >= 0, "released_tokens negative")
    }

    // decision determinism: prev(decision over same survivors) == cur
    val diff0 = Release.releaseDiff(docs, grams, clusters, quality, mixture,
      isNew = lit(false)).collect()
    diff0.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), "isNew=false: prev != cur n_released")
      assert(r.getLong(3) == 0 && r.getLong(4) == 0, "isNew=false: nonzero churn")
      assert(r.getLong(5) == r.getLong(6), "isNew=false: prev != cur tokens")
      assert(r.getLong(7) == r.getLong(8), "isNew=false: prev != cur threshold")
      assert(r.getLong(9) == r.getLong(10), "isNew=false: prev != cur keep_ppm")
    }
    // all-new: the prev decision layer must be exactly zero
    val diffAll = Release.releaseDiff(docs, grams, clusters, quality, mixture,
      isNew = lit(true)).collect()
    diffAll.foreach { r =>
      assert(r.getLong(1) == 0 && r.getLong(4) == 0 && r.getLong(5) == 0,
        "isNew=true: prev side must be zero")
      assert(r.getLong(2) == r.getLong(3), "isNew=true: cur must all be added")
    }
    // consume-then-release (the Checkpoints contract): count BEFORE
    // releasing — clusters' final checkpoint backs surv's keeper join,
    // and a released checkpoint cannot recompute
    val n = surv.count()
    graft.Graft.releaseLeases()
    n
  }

  test("empty corpus: whole chain runs, card and diff are empty, nothing crashes") {
    assert(checkChain(corpus(Seq.empty)) == 0)
  }

  test("one-doc corpus: the doc is its own keeper and survives") {
    val n = checkChain(corpus(Seq((7L, "solo", "alpha beta gamma delta eps zeta eta theta iota kappa"))))
    assert(n == 1)
  }

  test("all-duplicate corpus: one keeper, full-dup mass scrubbed downstream") {
    val text = "alpha beta gamma delta eps zeta eta theta iota kappa lambda mu"
    val docs = corpus((0L until 18L).map(i => (i, s"s${i % 3}", text)))
    val n = checkChain(docs)
    assert(n == 1, s"expected exactly the min-id keeper to survive, got $n")
  }

  test("sub-gram-width docs (< 8 tokens) flow through with zero dup grams") {
    val docs = corpus(Seq((1L, "a", "alpha beta"), (2L, "a", "gamma"),
      (3L, "b", ""), (4L, "b", "delta eps zeta")))
    assert(checkChain(docs) == 4) // no pairs, no grams: everyone is a keeper
  }

  test("zero-releasable corpus: every survivor fully scrubbed, card still complete") {
    // two identical LONG docs per source: the non-keeper's grams mark
    // every keeper span as duplicated, so clean_text is empty and the
    // pack stage sees zero chunks — the card must still carry all rows
    val text = ("alpha beta gamma delta " * 6).trim
    val docs = corpus(Seq((0L, "x", text), (1L, "x", text),
      (2L, "y", text), (3L, "y", text)))
    checkChain(docs)
  }

  test("property: chain invariants hold for random tiny-vocab corpora") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val gen: Gen[List[(Long, String, String)]] = for {
      n <- Gen.choose(0, 24)
      rows <- Gen.listOfN(n, for {
        len <- Gen.choose(0, 24)
        ws <- Gen.listOfN(len, Gen.oneOf(vocab))
        src <- Gen.oneOf("s0", "s1", "s2")
      } yield (ws.mkString(" "), src))
    } yield rows.zipWithIndex.map { case ((t, s), i) => (i.toLong, s, t) }
    val prop = Prop.forAllNoShrink(gen) { rows =>
      checkChain(corpus(rows)); true
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6).withInitialSeed(Seed(12L)), prop)
    assert(res.passed, res.status.toString)
  }
}
