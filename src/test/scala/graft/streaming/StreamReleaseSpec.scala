package graft.streaming

import graft.SparkSpec
import graft.operators.Components
import graft.pipeline.Release
import graft.text.{SegmentDedup, TextAnalysis, TextDedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream ≡ batch for the composed release capstone: after N
  * micro-batches the continuously-maintained card must equal
  * [[Release.releaseCard]] over the union of every ingested doc —
  * including a cluster MERGE that demotes an already-admitted keeper —
  * and a redelivered batch must be a no-op. */
class StreamReleaseSpec extends SparkSpec {
  import spark.implicits._

  private val L = 3          // substring-scrub gram length
  private val Thresh = 0.3   // near-dup jaccard threshold (both sides)

  // Ascending doc_ids across batches (the documented ingestion
  // precondition). d1/d5 are dissimilar keepers of separate clusters;
  // d20 = d1's text ++ d5's text is a moderate near-dup of BOTH, so
  // batch 2 merges the two clusters and DEMOTES d5 (min label 1).
  // d11 repeats a ≥3-token span of d2 verbatim (cross-batch scrub);
  // d21 repeats a span of d12 (scrub against batch-1 history).
  private val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val t5 = "neutron proton electron muon tau quark lepton boson photon gluon hadron meson"
  private val batches: Seq[Seq[(Long, String, String)]] = Seq(
    Seq((1L, "a", t1),
      (2L, "a", "one two three four five six seven eight nine"),
      (3L, "b", "red green blue cyan magenta yellow black white")),
    Seq((5L, "b", t5),
      (11L, "b", "zzz one two three four five qqq www eee"),
      (12L, "a", "lorem ipsum dolor sit amet consectetur adipiscing elit sed")),
    Seq((20L, "a", t1 + " " + t5),
      (21L, "b", "prefix dolor sit amet consectetur suffix tokens here now"),
      (22L, "b", "entirely fresh vocabulary with no overlap at all today")))

  private def allDocs: DataFrame =
    batches.flatten.toDF("doc_id", "source", "text")

  private def mixture: DataFrame =
    Seq(("a", 600000L), ("b", 400000L)).toDF("source", "mix_ppm")

  /** The batch capstone over the full corpus, clusters/quality/grams
    * built exactly as the warehouse builds its artifacts. */
  private def batchCard: DataFrame = {
    val docs = allDocs
    val clusters = Components.minLabel(
        docs.select(col("doc_id").as("id")),
        TextDedup.minhashLshPairs(docs.select(col("doc_id"), col("text")), Thresh)
          .select(col("doc_a").as("src"), col("doc_b").as("dst")))
      .select(col("id").as("doc_id"), col("component").as("cluster_id"))
    Release.releaseCard(
      docs,
      SegmentDedup.gramOccurrences(docs.select(col("doc_id"), col("text")), L),
      clusters,
      TextAnalysis.compositeQuality(docs.select(col("doc_id"), col("text"))),
      mixture, minTokens = L)
  }

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"srel_$tag").toString

  private def ingestAll(state: String): Unit =
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamRelease.mergeBatch(spark,
        b.toDF("doc_id", "source", "text"), i.toLong, state, mixture,
        minTokens = L, threshold = Thresh)
    }

  test("streamed card equals the batch release card after all batches") {
    val state = tmp("eq")
    ingestAll(state)
    assertSameRows(spark.read.parquet(s"$state/card"), rowsOf(batchCard))

    // the comparison is not vacuous: the merge really demoted d5 —
    // its cluster label dropped to 1, so it left the survivor set
    val clusters = spark.read.parquet(s"$state/clusters")
      .as[(Long, Long)].collect().toMap
    assert(clusters(5L) == 1L, s"expected d20 to merge d5 into cluster 1, got $clusters")
    assert(clusters(20L) == 1L)
    // and the cross-batch scrub really fired: d11 lost d2's span
    val pool = spark.read.parquet(s"$state/pool")
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(pool(11L) == "zzz qqq www eee", s"got ${pool.get(11L)}")
  }

  test("maintained band artifact equals a cold capped re-band of the corpus") {
    val state = tmp("bands")
    ingestAll(state)
    assertSameRows(
      spark.read.parquet(s"$state/bands").select("doc_id", "band", "band_key"),
      rowsOf(TextDedup.bandSignatures(
        TextDedup.shingled(allDocs.select(col("doc_id"), col("text"))),
        TextDedup.LshMaxBucket)))
    // append-only: landed batches each carry their own subdir (the
    // artifact grows by appends, never rewrites history)
    val fs = new org.apache.hadoop.fs.Path("/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(s"$state/bands"))
      .map(_.getPath.getName).filter(_.startsWith("batch=")).sorted
    assert(parts.toSeq == Seq("batch=0", "batch=1", "batch=2"))
  }

  test("crash BEFORE the ledger commit: re-delivery converges to the clean state") {
    val clean = tmp("crashclean")
    ingestAll(clean)

    // ingest batches 0–1, snapshot the ledger (gram_index), ingest
    // batch 2 fully, then RESTORE the snapshot: every batch-2 state
    // write has landed but the ledger still says 1 — the widest
    // pre-ledger crash window. Re-delivery must re-run batch 2 against
    // the HISTORY it saw the first time (the batch<batchId reads) and
    // land the identical state.
    val state = tmp("crash")
    batches.zipWithIndex.take(2).foreach { case (b, i) =>
      StreamRelease.mergeBatch(spark, b.toDF("doc_id", "source", "text"),
        i.toLong, state, mixture, minTokens = L, threshold = Thresh)
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path("/").getFileSystem(conf)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val snap = tmp("crashsnap")
    org.apache.hadoop.fs.FileUtil.copy(
      fs, p(s"$state/gram_index"), fs, p(s"$snap/gram_index"), false, conf)
    StreamRelease.mergeBatch(spark, batches(2).toDF("doc_id", "source", "text"),
      2L, state, mixture, minTokens = L, threshold = Thresh)
    fs.delete(p(s"$state/gram_index"), true)
    org.apache.hadoop.fs.FileUtil.copy(
      fs, p(s"$snap/gram_index"), fs, p(s"$state/gram_index"), false, conf)

    StreamRelease.mergeBatch(spark, batches(2).toDF("doc_id", "source", "text"),
      2L, state, mixture, minTokens = L, threshold = Thresh)
    for (t <- Seq("card", "clusters", "gram_index"))
      assertSameRows(spark.read.parquet(s"$state/$t"),
        rowsOf(spark.read.parquet(s"$clean/$t")))
    for (t <- Seq("bands", "shingles", "pool"))
      assertSameRows(
        spark.read.parquet(s"$state/$t").drop("batch"),
        rowsOf(spark.read.parquet(s"$clean/$t").drop("batch")))
  }

  test("redelivered batch is a no-op and the card self-heals") {
    val state = tmp("replay")
    ingestAll(state)
    val before = rowsOf(spark.read.parquet(s"$state/card"))
    val beforeClusters = rowsOf(spark.read.parquet(s"$state/clusters"))

    // replay the last batch: ledger makes it a no-op
    StreamRelease.mergeBatch(spark,
      batches(2).toDF("doc_id", "source", "text"), 2L, state, mixture,
      minTokens = L, threshold = Thresh)
    assertSameRows(spark.read.parquet(s"$state/card"), before)
    assertSameRows(spark.read.parquet(s"$state/clusters"), beforeClusters)

    // crash between ledger commit and card swap: the card is gone but
    // the ledger says batch 2 merged — the next delivery heals it
    val fs = new org.apache.hadoop.fs.Path("/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$state/card"), true)
    StreamRelease.mergeBatch(spark,
      batches(2).toDF("doc_id", "source", "text"), 2L, state, mixture,
      minTokens = L, threshold = Thresh)
    assertSameRows(spark.read.parquet(s"$state/card"), before)
  }

  test("foreachBatch sink wires the same merge") {
    implicit val sqlCtx = spark.sqlContext
    val state = tmp("sink")
    val in = MemoryStream[(Long, String, String)]
    val q = StreamRelease.sink(spark, in.toDF.toDF("doc_id", "source", "text"),
      state, mixture, tmp("ckpt"), minTokens = L, threshold = Thresh)
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      assertSameRows(spark.read.parquet(s"$state/card"), rowsOf(batchCard))
    } finally q.stop()
  }
}
