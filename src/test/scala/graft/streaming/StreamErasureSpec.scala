package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{BloomPrune, Erasure}
import graft.sources.Ingest
import graft.text.{SegmentDedup, TextAnalysis}

/** [[StreamErasure]] — continuous RTBF over the index artifacts. Pins:
  * streamed victim batches ≡ one-shot erasure ≡ (for the rebuildable
  * artifacts) a cold rebuild over the surviving corpus; bloom rebuild
  * byte-equality; replay/crash idempotence; the ledger as cumulative
  * compliance record. */
class StreamErasureSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"serase_$tag").toString

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "pack my box with five dozen liquor jugs again now"),
    (3L, "the quick brown fox jumps over the lazy dog tonight"),
    (4L, "sphinx of black quartz judge my vow now then maybe"),
    (5L, "the quick brown fox jumps over the lazy dog forever"))
  private def docs = corpus.toDF("doc_id", "text")
  private def docsWithout(victims: Set[Long]) =
    corpus.filterNot(r => victims(r._1)).toDF("doc_id", "text")

  /** Land the maintained artifacts for `d` under a fresh root. */
  private def landArtifacts(d: DataFrame): String = {
    val root = tmp("root")
    val postings = TextAnalysis.bm25Postings(d)
    Ingest.overwriteSwap(spark, postings, s"$root/${StreamErasure.Postings}")
    Ingest.overwriteSwap(spark,
      graft.warehouse.Warehouse.buildBm25DocLens(postings),
      s"$root/${StreamErasure.DocLens}")
    val grams = SegmentDedup.gramOccurrences(d)
    Ingest.overwriteSwap(spark, grams, s"$root/${StreamErasure.GramOccurrences}")
    // the warehouse definition: distinct hashes of the BASE slice
    val idx = grams.where(pmod(col("doc_id"), lit(10)) =!= 7)
      .select(col("h")).distinct()
    Ingest.overwriteSwap(spark, idx, s"$root/${StreamErasure.GramIndex}")
    val n = idx.count()
    Ingest.overwriteSwap(spark,
      Seq((BloomPrune.sketchBloomBytes(idx, "h", math.max(n, 1L), 0.01), n, 10000L))
        .toDF("bf", "n_items", "fpp_micro").repartition(1),
      s"$root/${StreamErasure.GramBloom}")
    // near-dup graph: 1~3~5 (the fox template), singletons 2, 4
    Ingest.overwriteSwap(spark,
      Seq((1L, 3L, 0.9), (3L, 5L, 0.85)).toDF("doc_a", "doc_b", "jaccard"),
      s"$root/${StreamErasure.Pairs}")
    Ingest.overwriteSwap(spark,
      Seq((1L, 1L), (3L, 1L), (5L, 1L), (2L, 2L), (4L, 4L))
        .toDF("doc_id", "cluster_id"),
      s"$root/${StreamErasure.Clusters}")
    // the survivor pool carries the victims' scrubbed TEXT — the
    // compliance-critical artifact
    Ingest.overwriteSwap(spark,
      d.select(col("doc_id"), col("text").as("clean_text")),
      s"$root/${StreamErasure.ReleaseSurvivors}")
    root
  }

  private def table(root: String, name: String): DataFrame =
    spark.read.parquet(s"$root/$name")

  test("streamed victim batches equal a cold rebuild over the surviving corpus") {
    implicit val sqlCtx = spark.sqlContext
    val root = landArtifacts(docs)
    val in = MemoryStream[Long]
    val q = StreamErasure.sink(spark, in.toDF.toDF("key"), root, tmp("ck"))
    try {
      in.addData(1L); q.processAllAvailable()    // batch 0: victim 1
      in.addData(4L, 99L); q.processAllAvailable() // batch 1: victim 4 (+unknown id)
    } finally q.stop()
    val surviving = docsWithout(Set(1L, 4L))
    // rebuildable artifacts: maintained state ≡ cold build over survivors
    assert(rowsOf(table(root, StreamErasure.Postings)) ==
      rowsOf(TextAnalysis.bm25Postings(surviving)), "postings")
    assert(rowsOf(table(root, StreamErasure.DocLens)) ==
      rowsOf(graft.warehouse.Warehouse.buildBm25DocLens(
        TextAnalysis.bm25Postings(surviving))), "doclens")
    assert(rowsOf(table(root, StreamErasure.GramOccurrences)) ==
      rowsOf(SegmentDedup.gramOccurrences(surviving)), "grams")
    assert(rowsOf(table(root, StreamErasure.GramIndex)) ==
      rowsOf(SegmentDedup.gramOccurrences(surviving)
        .where(pmod(col("doc_id"), lit(10)) =!= 7)
        .select(col("h")).distinct()),
      "gram index repair ≠ surviving-base-corpus index")
    // the survivor pool no longer holds the victims' text
    assert(table(root, StreamErasure.ReleaseSurvivors)
      .select("doc_id").as[Long].collect().toSet == Set(2L, 3L, 5L),
      "release_survivors retained an erased doc's text")
    // bloom: byte-identical to a cold build over the repaired index
    // (same set, same geometry — order-independent bitmap)
    val idx = table(root, StreamErasure.GramIndex)
    val coldBloom = BloomPrune.sketchBloomBytes(idx, "h", math.max(idx.count(), 1L), 0.01)
    val landedBloom = table(root, StreamErasure.GramBloom)
      .select("bf").head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(landedBloom, coldBloom), "bloom bytes")
    // pair/cluster artifacts follow the q141 semantics
    assert(rowsOf(table(root, StreamErasure.Pairs)) ==
      Seq(Seq("3", "5", "0.85")), "pairs any-endpoint rule")
    assert(rowsOf(table(root, StreamErasure.Clusters)).toSet ==
      Set(Seq("3", "3"), Seq("5", "3"), Seq("2", "2")),
      "clusters relabeled to min surviving member")
    // ledger: cumulative compliance record
    assert(table(root, StreamErasure.Ledger)
      .select("key", "batch_id").as[(Long, Long)].collect().toSet ==
      Set((1L, 0L), (4L, 1L), (99L, 1L)))
  }

  test("N batches ≡ one batch; redelivery is a no-op") {
    val rootN = landArtifacts(docs)
    StreamErasure.mergeBatch(spark, Seq(1L).toDF("key"), 0L, rootN)
    StreamErasure.mergeBatch(spark, Seq(4L).toDF("key"), 1L, rootN)
    val root1 = landArtifacts(docs)
    StreamErasure.mergeBatch(spark, Seq(1L, 4L).toDF("key"), 0L, root1)
    for (t <- Seq(StreamErasure.Postings, StreamErasure.DocLens,
        StreamErasure.GramOccurrences, StreamErasure.GramIndex,
        StreamErasure.Pairs, StreamErasure.Clusters,
        StreamErasure.ReleaseSurvivors))
      assert(rowsOf(table(rootN, t)) == rowsOf(table(root1, t)), t)
    // replay the last batch: nothing moves
    val before = Seq(StreamErasure.Postings, StreamErasure.Clusters,
      StreamErasure.Ledger).map(t => rowsOf(table(rootN, t)))
    StreamErasure.mergeBatch(spark, Seq(4L).toDF("key"), 1L, rootN)
    val after = Seq(StreamErasure.Postings, StreamErasure.Clusters,
      StreamErasure.Ledger).map(t => rowsOf(table(rootN, t)))
    assert(before == after)
  }

  test("crash between table swaps and ledger commit: the retry converges") {
    val root = landArtifacts(docs)
    StreamErasure.mergeBatch(spark, Seq(1L).toDF("key"), 0L, root)
    // simulate the crash: batch 1's table work ran but the ledger
    // write never happened — apply the erasure steps by hand
    val v = Seq(4L).toDF("key")
    Ingest.overwriteSwap(spark,
      Erasure.erase(table(root, StreamErasure.Postings), "doc_id", v),
      s"$root/${StreamErasure.Postings}")
    Ingest.overwriteSwap(spark,
      Erasure.relabelClusters(table(root, StreamErasure.Clusters), v),
      s"$root/${StreamErasure.Clusters}")
    // redelivery of batch 1 (victim 4 not yet in the ledger)
    // re-applies everything
    StreamErasure.mergeBatch(spark, v, 1L, root)
    val surviving = docsWithout(Set(1L, 4L))
    assert(rowsOf(table(root, StreamErasure.Postings)) ==
      rowsOf(TextAnalysis.bm25Postings(surviving)))
    assert(rowsOf(table(root, StreamErasure.GramIndex)) ==
      rowsOf(SegmentDedup.gramOccurrences(surviving)
        .where(pmod(col("doc_id"), lit(10)) =!= 7)
        .select(col("h")).distinct()))
    assert(table(root, StreamErasure.Ledger)
      .agg(max(col("batch_id"))).head.getLong(0) == 1L)
  }

  test("crash AFTER the base erase (victim evidence gone): the retry converges") {
    // The victim-scoped index repair reads the victims' own gram rows
    // as evidence. Ordering (repair BEFORE base erase) is what makes
    // this crash window safe: simulate a first attempt that got through
    // the index repair AND the base erase, then died before the
    // pair/cluster/ledger steps — the replay sees an empty victim-hash
    // set and must leave the already-repaired index alone while
    // finishing the remaining artifacts.
    val root = landArtifacts(docs)
    val v = Seq(4L).toDF("key")
    val baseSlice = table(root, StreamErasure.GramOccurrences)
      .where(pmod(col("doc_id"), lit(10)) =!= 7)
    val victimGrams = baseSlice.join(v.withColumnRenamed("key", "doc_id"),
      Seq("doc_id"), "left_semi").select(col("h")).distinct().localCheckpoint(true)
    Ingest.overwriteSwap(spark,
      Erasure.repairDistinctIndexVictimScoped(
        table(root, StreamErasure.GramIndex), "h",
        Erasure.erase(baseSlice, "doc_id", v), victimGrams),
      s"$root/${StreamErasure.GramIndex}")
    Ingest.overwriteSwap(spark,
      Erasure.erase(table(root, StreamErasure.GramOccurrences), "doc_id", v),
      s"$root/${StreamErasure.GramOccurrences}")
    // redelivery (victim 4 not in the ledger) — replays every step
    StreamErasure.mergeBatch(spark, v, 0L, root)
    val surviving = docsWithout(Set(4L))
    assert(rowsOf(table(root, StreamErasure.GramIndex)) ==
      rowsOf(SegmentDedup.gramOccurrences(surviving)
        .where(pmod(col("doc_id"), lit(10)) =!= 7)
        .select(col("h")).distinct()))
    assert(rowsOf(table(root, StreamErasure.Postings)) ==
      rowsOf(TextAnalysis.bm25Postings(surviving)))
  }

  test("fresh-checkpoint restart: new victims at a reset batchId still apply") {
    // batchIds are checkpoint-scoped; the ledger outlives checkpoints.
    // A batch-id watermark would silently drop these — the guard must
    // be key-based (a deletion request is never silently skipped).
    val root = landArtifacts(docs)
    StreamErasure.mergeBatch(spark, Seq(1L).toDF("key"), 5L, root)
    StreamErasure.mergeBatch(spark, Seq(4L).toDF("key"), 0L, root) // new checkpoint
    val surviving = docsWithout(Set(1L, 4L))
    assert(rowsOf(table(root, StreamErasure.Postings)) ==
      rowsOf(TextAnalysis.bm25Postings(surviving)))
    assert(table(root, StreamErasure.Ledger)
      .select("key").as[Long].collect().toSet == Set(1L, 4L))
  }

  test("bloom rebuild defers below the shrink threshold, keeps no-false-negatives, fires above it") {
    val root = landArtifacts(docs)
    val originalBloom = table(root, StreamErasure.GramBloom)
      .select("bf").head.getAs[Array[Byte]](0)
    // erasing doc 1 removes ONE of the 11 base-index hashes (its only
    // non-shared 8-gram) — 9.1% < the 10% threshold: the bloom is NOT
    // rebuilt (byte-equal to the original), and because erasure only
    // removes keys, the stale superset bloom still hits every
    // surviving index key (the no-false-negative contract)
    StreamErasure.mergeBatch(spark, Seq(1L).toDF("key"), 0L, root)
    val deferredBloom = table(root, StreamErasure.GramBloom)
      .select("bf").head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(deferredBloom, originalBloom),
      "bloom rebuilt below the shrink threshold")
    val idx = table(root, StreamErasure.GramIndex)
    assert(idx.where(!graft.operators.BloomPrune.mightContainLong(
        deferredBloom, col("h"))).isEmpty,
      "stale bloom dropped a surviving index key (false negative)")
    // erasing doc 4 removes three more hashes — cumulative shrink 36%
    // crosses the threshold: rebuild fires, byte-equal to a cold build
    StreamErasure.mergeBatch(spark, Seq(4L).toDF("key"), 1L, root)
    val rebuilt = table(root, StreamErasure.GramBloom)
      .select("bf").head.getAs[Array[Byte]](0)
    val idx2 = table(root, StreamErasure.GramIndex)
    val cold = BloomPrune.sketchBloomBytes(idx2, "h", math.max(idx2.count(), 1L), 0.01)
    assert(java.util.Arrays.equals(rebuilt, cold),
      "threshold-crossing batch did not rebuild to the cold bytes")
    assert(!java.util.Arrays.equals(rebuilt, originalBloom))
  }

  test("eager mode (shrinkPct = 0) rebuilds on every mutating batch") {
    val root = landArtifacts(docs)
    StreamErasure.mergeBatch(spark, Seq(1L).toDF("key"), 0L, root,
      bloomRebuildShrinkPct = 0)
    val idx = table(root, StreamErasure.GramIndex)
    val cold = BloomPrune.sketchBloomBytes(idx, "h", math.max(idx.count(), 1L), 0.01)
    val landed = table(root, StreamErasure.GramBloom)
      .select("bf").head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(landed, cold),
      "eager mode kept a stale bloom after a sub-threshold erase")
  }

  test("keepers-only survivor pool: a promoted keeper's row is NOT re-added (documented shrink)") {
    // land the pool the way the warehouse builds it — KEEPERS ONLY
    // (doc 1 keeps cluster {1,3,5}; 2 and 4 are singletons)
    val root = landArtifacts(docs)
    Ingest.overwriteSwap(spark,
      docs.where(col("doc_id").isin(1L, 2L, 4L))
        .select(col("doc_id"), col("text").as("clean_text")),
      s"$root/${StreamErasure.ReleaseSurvivors}")
    StreamErasure.mergeBatch(spark, Seq(1L).toDF("key"), 0L, root)
    // the relabel promoted doc 3 to cluster keeper…
    assert(rowsOf(table(root, StreamErasure.Clusters)).toSet ==
      Set(Seq("3", "3"), Seq("5", "3"), Seq("2", "2"), Seq("4", "4")))
    // …but the pool only shrinks: victim gone (the privacy contract),
    // promoted keeper 3 NOT re-derived (needs raw text — deliberately
    // not a maintained artifact; the cold warehouse rebuild is the
    // repair path, as documented in StreamErasure.mergeBatch)
    assert(table(root, StreamErasure.ReleaseSurvivors)
      .select("doc_id").as[Long].collect().toSet == Set(2L, 4L))
  }

  test("a root with the bloom but no index fails fast before any mutation") {
    val root = landArtifacts(docs)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/${StreamErasure.GramIndex}"), true)
    val before = rowsOf(table(root, StreamErasure.Postings))
    val ex = intercept[IllegalArgumentException] {
      StreamErasure.mergeBatch(spark, Seq(1L).toDF("key"), 0L, root)
    }
    assert(ex.getMessage.contains(StreamErasure.GramBloom))
    assert(rowsOf(table(root, StreamErasure.Postings)) == before,
      "fail-fast still mutated an artifact")
  }

  test("index repair follows the base-corpus slice: a holdout-only carrier cannot keep a hash") {
    // doc 7 (holdout: 7 % 10 == 7) duplicates doc 1's text. Doc 1's
    // third gram has NO other base-corpus carrier, so after erasing
    // doc 1 the maintained index must drop it (the warehouse
    // definition is distinct-h over the BASE slice) — probing the
    // full corpus would keep it via doc 7 and fork the maintained
    // index from a cold rebuild.
    val withHoldout = (corpus :+ ((7L, corpus.head._2))).toDF("doc_id", "text")
    val root = landArtifacts(withHoldout)
    StreamErasure.mergeBatch(spark, Seq(1L).toDF("key"), 0L, root)
    val survivingBase = corpus.filterNot(_._1 == 1L).toDF("doc_id", "text")
    assert(rowsOf(table(root, StreamErasure.GramIndex)) ==
      rowsOf(SegmentDedup.gramOccurrences(survivingBase)
        .select(col("h")).distinct()),
      "a holdout-only carrier kept a hash in the base index")
  }
}
