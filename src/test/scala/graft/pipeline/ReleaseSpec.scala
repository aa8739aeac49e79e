package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stage-visibility checks for the release capstone on a hand-built
  * corpus where every gate provably removes something — the q140
  * oracle gates the full-chain arithmetic; this spec pins that each
  * stage is actually load-bearing (a chain that silently skipped a
  * stage could still pass a too-easy corpus). */
class ReleaseSpec extends SparkSpec {
  import spark.implicits._

  test("every stage of the chain removes what it should, and the card adds up") {
    // source A: 4 docs — two exact-ish near-dups (one cluster), plus a
    // doc that repeats a span of doc 1 (scrub fodder); source B: 4
    // distinct docs of varied quality
    val boiler = (1 to 10).map(i => s"w$i").mkString(" ") // 10-token span
    val docs = Seq(
      (1L, "A", s"$boiler alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "A", s"$boiler alpha beta gamma delta epsilon zeta eta theta"), // near-dup of 1
      (3L, "A", s"unique three content here entirely $boiler"),            // repeats the span
      (4L, "A", "short junk"),
      (10L, "B", "b one has plenty of ordinary distinct text to keep around"),
      (11L, "B", "b two has plenty of ordinary distinct words to keep nearby"),
      (12L, "B", "b three rather different material discussing other topics"),
      (13L, "B", "b four concluding document with separate subject matter")
    ).toDF("doc_id", "source", "text")
    val grams = graft.text.SegmentDedup.gramOccurrences(
      docs.select($"doc_id", $"text"), minTokens = 8)
    val pairs = graft.text.TextDedup.minhashLshPairs(docs.select($"doc_id", $"text"))
    val clusters = graft.operators.Components.minLabel(
        docs.select($"doc_id".as("id")),
        pairs.select($"doc_a".as("src"), $"doc_b".as("dst")))
      .select($"id".as("doc_id"), $"component".as("cluster_id"))
    val quality = graft.text.TextAnalysis.compositeQuality(docs.select($"doc_id", $"text"))
    // generous targets (mix >= any realizable share) so keep_ppm
    // saturates at 1e6 and the hash sample is deterministic-keep-all —
    // the sampling arithmetic itself is q132/q140-oracle-gated
    val mixture = Seq(("A", 900000L), ("B", 900000L)).toDF("source", "mix_ppm")

    val card = Release.releaseCard(docs, grams, clusters, quality, mixture)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(card.keySet == Set("A", "B"))
    val a = card("A"); val b = card("B")
    // near-dup stage: docs 1/2 cluster together → A loses ≥ 1 survivor
    assert(a.getAs[Long]("n_docs_raw") == 4L)
    assert(a.getAs[Long]("n_survivors") < 4L, "near-dup keeper stage removed nothing")
    // quality gate: top quartile of survivors keeps fewer than all
    assert(a.getAs[Long]("n_gated") <= a.getAs[Long]("n_survivors"))
    // scrub stage: doc 3 repeats doc 1's span — if doc 3 released, its
    // tokens shrink; at minimum the A-side scrub rate is sane ppm
    val ppm = a.getAs[Long]("scrub_removed_ppm")
    assert(ppm >= 0L && ppm <= 1000000L)
    // mixture: keep_ppm within [0, 1e6], released ≤ gated
    for (r <- Seq(a, b)) {
      assert(r.getAs[Long]("keep_ppm") >= 0L && r.getAs[Long]("keep_ppm") <= 1000000L)
      assert(r.getAs[Long]("n_released") <= r.getAs[Long]("n_gated"))
      // pack stage: released docs with tokens produce chunks
      assert(r.getAs[Long]("n_chunks") >= 0L)
      if (r.getAs[Long]("released_tokens") > 0L)
        assert(r.getAs[Long]("n_chunks") > 0L, s"released tokens but no chunks: $r")
    }
    // B has no dups and no repeated spans: nothing scrubbed
    assert(b.getAs[Long]("scrub_removed_ppm") == 0L)
    assert(b.getAs[Long]("n_survivors") == 4L)
  }

  test("a fully-filtered source still appears in the card with zeroed stage columns") {
    // source C is absent from the mixture table — its docs survive the
    // scrub and the gate but die at mixture realization; a card that
    // drops the row (the r10 inner-join shape) misrepresents the release
    val docs = Seq(
      (1L, "B", "b one has plenty of ordinary distinct text to keep around"),
      (2L, "B", "b two has plenty of ordinary distinct words to keep nearby"),
      (20L, "C", "c only doc with its own entirely separate wording here")
    ).toDF("doc_id", "source", "text")
    val grams = graft.text.SegmentDedup.gramOccurrences(
      docs.select($"doc_id", $"text"), minTokens = 8)
    val clusters = docs.select($"doc_id", $"doc_id".as("cluster_id"))
    val quality = graft.text.TextAnalysis.compositeQuality(docs.select($"doc_id", $"text"))
    val mixture = Seq(("B", 1000000L)).toDF("source", "mix_ppm") // no C row
    val card = Release.releaseCard(docs, grams, clusters, quality, mixture)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(card.keySet == Set("B", "C"), s"card dropped a source: ${card.keySet}")
    val c = card("C")
    assert(c.getAs[Long]("n_docs_raw") == 1L)
    assert(c.getAs[Long]("n_survivors") == 1L) // stages BEFORE the drop still report
    for (f <- Seq("n_gated", "share_ppm", "mix_ppm", "keep_ppm", "n_released",
        "released_tokens", "n_chunks", "n_packs_touched"))
      assert(c.getAs[Long](f) == 0L, s"$f should be zeroed for a mixture-absent source")
  }

  test("releaseDiff: a high-quality batch RAISES the gate and de-releases an old doc") {
    // the removal branch the sf corpora never exercise: quality is
    // injected directly so the arithmetic is exact. Base source A docs
    // 1-4 (quality 10..40): top-quartile threshold = 40 → doc 4
    // released. Batch adds docs 11/12 (quality 50/60): cur threshold =
    // 60 → only doc 12 survives the gate — doc 4 is DE-RELEASED.
    val docs = Seq(
      (1L, "A", "one two three four five six seven eight nine ten"),
      (2L, "A", "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen"),
      (3L, "A", "twenty one twenty two twenty three twenty four twenty five six"),
      (4L, "A", "thirty one thirty two thirty three thirty four thirty five six"),
      (11L, "A", "forty one forty two forty three forty four forty five forty"),
      (12L, "A", "fifty one fifty two fifty three fifty four fifty five fifty")
    ).toDF("doc_id", "source", "text")
    val grams = graft.text.SegmentDedup.gramOccurrences(
      docs.select($"doc_id", $"text"), minTokens = 8)
    val clusters = docs.select($"doc_id", $"doc_id".as("cluster_id"))
    val quality = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L),
      (11L, 50L), (12L, 60L)).toDF("doc_id", "quality")
    val mixture = Seq(("A", 1000000L)).toDF("source", "mix_ppm")
    val row = Release.releaseDiff(docs, grams, clusters, quality, mixture,
        isNew = $"doc_id" >= 10L)
      .collect().map(r => r.getString(0) -> r).toMap.apply("A")
    assert(row.getAs[Long]("threshold_prev") == 40L)
    assert(row.getAs[Long]("threshold_cur") == 60L)
    assert(row.getAs[Long]("n_released_prev") == 1L) // doc 4
    assert(row.getAs[Long]("n_released_cur") == 1L)  // doc 12
    assert(row.getAs[Long]("n_added") == 1L)
    assert(row.getAs[Long]("n_removed") == 1L, "the de-release branch never fired")
  }

  test("decisionTable: single dominant source — windows run over the " +
      "distinct-quality table, values match the brute-force gate") {
    // r16 skew fix: a planted ONE-source frame with many rows but FEW
    // distinct qualities. The cumulative window's input must be the
    // value-compressed (source, quality) aggregate — bounded by score
    // cardinality, never document count (the r15 shape sorted every
    // survivor row of a source in one window partition) — and the
    // scalars must equal a from-scratch replay of the top-quartile
    // gate over the raw rows.
    val n = 4000
    // data-backed rows (not selectExpr over literals — Catalyst would
    // constant-fold the source key out of the aggregate we assert on)
    val surv = (1 to n)
      .map(i => ("mega", i.toLong, i.toLong % 7, i.toLong % 13))
      .toDF("source", "doc_id", "quality", "kept_tokens")
    val dec = Release.decisionTable(surv)
    // boundedness evidence: the value-compressing aggregate sits BELOW
    // every window (group-then-window)
    val plan = dec.queryExecution.executedPlan.toString
    assert("HashAggregate\\(keys=\\[source#\\d+L?, quality#\\d+L?\\]".r
        .findFirstIn(plan).isDefined,
      s"decisionTable lost the distinct-quality aggregate below its windows:\n$plan")
    // semantic replay over the raw rows
    val rows = (1 to n).map(i => (i.toLong % 7, i.toLong % 13))
    val nRows = rows.size.toLong
    val need = math.max(1L, nRows * graft.text.Curation.TopFractionNum /
      graft.text.Curation.TopFractionDen)
    val threshold = (0L to 6L).sortBy(-_)
      .scanLeft((Long.MaxValue, 0L)) { case ((_, cum), q) =>
        (q, cum + rows.count(_._1 == q)) }
      .drop(1).filter(_._2 >= need).map(_._1).max
    val gated = rows.filter(_._1 >= threshold)
    val got = dec.collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_rows") == nRows)
    assert(r.getAs[Long]("threshold") == threshold)
    assert(r.getAs[Long]("n_gated") == gated.size.toLong)
    assert(r.getAs[Long]("gated_tokens") == gated.map(_._2).sum)
    assert(r.getAs[Long]("all_tokens") == gated.map(_._2).sum)
  }
}
