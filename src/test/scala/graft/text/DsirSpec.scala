package graft.text

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // en docs live on alpha/beta bigrams, de docs on gamma/delta — the
  // hashed-feature distributions separate, so the ratio scorer must
  // rank en-typical TEXT above de-typical text regardless of the
  // doc's own lang tag (DSIR scores content, not labels). d1/d3 repeat
  // their text 300× so real counts dominate the add-one smoothing over
  // the 1024-bucket domain — the regime DSIR actually runs in (a
  // 6-bigram corpus against 1024 smoothing buckets collapses every
  // ratio toward 1 and below; at corpus scale counts win).
  private val docs = Seq(
    (1L, Seq.fill(300)("alpha beta").mkString(" "), "en"),
    (2L, "alpha beta gamma", "en"),
    (3L, Seq.fill(300)("gamma delta").mkString(" "), "de"),
    (4L, "alpha beta alpha", "de"),
    (5L, "solo", "en")).toDF("doc_id", "text", "lang")

  // bigram occurrence totals for the fixture: d1 = 599 (ab×300,
  // ba×299), d2 = 2 (ab, bg), d3 = 599 (gd×300, dg×299), d4 = 2 (ab,
  // ba), d5 = 0 → tot_t (en) = 601, tot_r = 1202.
  private val TotT = 601L
  private val TotR = 1202L
  private def ratioPpm(cntT: Long, cntR: Long): Long = {
    val pT = (cntT + 1L) * 1000000000L / (TotT + 1024L)
    val pR = (cntR + 1L) * 1000000000L / (TotR + 1024L)
    pT * 1000000L / pR
  }

  test("target-typical text outscores raw-typical text, labels ignored") {
    val out = Curation.dsirWeights(docs).select("doc_id", "n_feats", "score_ppm",
        "keep_target_like").as[(Long, Long, Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    // d5 has one token → no bigrams → absent (the q65 contract)
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L)._2 == 599L && out(3L)._2 == 599L && out(4L)._2 == 2L)
    // en-bigram docs above the de-bigram doc, wherever the tag sits
    assert(out(4L)._3 > out(3L)._3)
    assert(out(1L)._3 > out(3L)._3)
    // the target-typical doc is kept, the raw-only one is not
    assert(out(1L)._4 == 1 && out(3L)._4 == 0)
    // flags follow the 1e6 boundary exactly
    out.values.foreach { case (_, _, s, k) =>
      assert(k == (if (s >= 1000000L) 1 else 0))
    }
  }

  test("score is the exact integer ratio mean of the doc's features") {
    val out = Curation.dsirWeights(docs)
      .select("doc_id", "score_ppm").as[(Long, Long)].collect().toMap
    // d4's features: "alpha beta" (cnt_t = 300+1 = 301, cnt_r = 302)
    // and "beta alpha" (cnt_t = 299, cnt_r = 300); replay the smoothed
    // ppb→ppm integer formula by hand.
    val expected4 = (ratioPpm(301, 302) + ratioPpm(299, 300)) / 2L
    assert(out(4L) == expected4)
    // d3 is all raw-only mass: every ratio far below 1e6
    val expected3 =
      (ratioPpm(0, 300) * 300L + ratioPpm(0, 299) * 299L) / 599L
    assert(out(3L) == expected3)
  }

  test("incremental scorer: OOV buckets take the smoothed uniform ratio") {
    val counts = Curation.dsirCounts(Curation.dsirFeatures(docs))
    // a batch whose bigrams the corpus never saw: every feature falls
    // back to the OOV ratio (cnt_t = cnt_r = 0 under the same formula)
    val batch = Seq((10L, "zeta eta zeta")).toDF("doc_id", "text")
    val out = Curation.dsirScoreAgainstCounts(
        Curation.dsirFeatures(batch), counts)
      .select("doc_id", "n_feats", "score_ppm").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(10L) == ((2L, ratioPpm(0, 0))))
    // and a batch of corpus-typical text scores exactly what the full
    // pass gave it (same counts, same formula — the incremental path
    // introduces no drift)
    val full = Curation.dsirWeights(docs)
      .select("doc_id", "score_ppm").as[(Long, Long)].collect().toMap
    val inc = Curation.dsirScoreAgainstCounts(
        Curation.dsirFeatures(docs.select("doc_id", "text")), counts)
      .select("doc_id", "score_ppm").as[(Long, Long)].collect().toMap
    assert(inc == full)
  }

  test("ppb floor: a corpus past 1e9 bigrams cannot divide by zero") {
    // synthetic counts with tot_r = 2e9: every ppb probability
    // underflows to 0 and the UNclamped ratio would throw
    // DIVIDE_BY_ZERO under ANSI Spark (NULL in DuckDB) — the clamp
    // floors both sides at 1 ppb and scoring proceeds
    val counts = Seq((0L, 2000000000L, 1000000000L))
      .toDF("feat", "cnt_r", "cnt_t")
    val probe = Seq((1L, "zeta eta theta")).toDF("doc_id", "text")
    val out = Curation.dsirScoreAgainstCounts(
        Curation.dsirFeatures(probe), counts)
      .select("score_ppm").as[Long].collect()
    assert(out.length == 1 && out.head >= 0L)
  }

  test("resample: keep probability is the exact clamped share; kept follows the hash") {
    val w = Curation.dsirWeights(docs)
      .select("doc_id", "score_ppm").as[(Long, Long)].collect().toMap
    val tot = w.values.sum
    val nTarget = w.size.toLong / 4  // 4 scored docs → target 1
    val out = Curation.dsirResample(docs)
      .select("doc_id", "score_ppm", "keep_prob_ppm", "kept")
      .as[(Long, Long, Long, Int)].collect()
    assert(out.map(_._1).toSet == w.keySet)
    out.foreach { case (id, s, p, k) =>
      assert(s == w(id))
      val expectedP = math.min(1000000L,
        s * 1000000L / math.max(1L, tot / math.max(1L, nTarget)))
      assert(p == expectedP, s"doc $id")
      // the keep bit replays from the 'rs:' hash — spark-side expr,
      // compared via a one-row replay through the registered function
      val hash = spark.sql(
        s"SELECT md5_prefix(concat('rs:', cast(${id}L as string)), 15) % 1000000")
        .head().getLong(0)
      assert(k == (if (hash < p) 1 else 0), s"doc $id")
    }
  }
}
