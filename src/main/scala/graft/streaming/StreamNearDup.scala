package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextDedup

/** Streaming NEAR-duplicate detection against a static corpus index —
  * the continuous sibling of [[graft.text.TextDedup.minhashLshPairs]]
  * and the second stage of the streaming curation front door (after
  * [[StreamDedup]]'s exact-hash gate): a document arriving on the
  * stream is flagged when it is a MinHash-LSH near-duplicate of a
  * document already in the admitted corpus.
  *
  * Shape (all Spark-native, no custom state):
  *  - the corpus index is the SAME banded signature table the batch
  *    operator uses — (doc_id, band, band_key) + a (doc_id, shingles)
  *    side table, both parquet/materialized, refreshed by the nightly
  *    batch pass;
  *  - per micro-batch, incoming docs compute shingles → minhash → band
  *    keys STATELESSLY (the codegen'd sketch expressions);
  *  - candidate generation is a stream-static equi join on
  *    (band, band_key) — stateless on the stream side;
  *  - band-collision duplicates collapse via
  *    `dropDuplicatesWithinWatermark` (bounded state, the
  *    [[StreamDedup]] pattern — unbounded pair-dedup state on a
  *    100 TB/day stream never shrinks);
  *  - exact-jaccard verification joins the static shingle table and
  *    filters — stateless.
  *
  * Scale: stream-side work is per-row map + hash joins against static
  * tables; the only state is the within-watermark pair-dedup ledger.
  */
object StreamNearDup {

  /** Static corpus index for [[flagAgainstCorpus]]: band table
    * (corpus_doc, band, band_key) from a (doc_id, shingles) projection —
    * materialize the result (parquet or persist) once per corpus
    * refresh. The [[TextDedup.LshMaxBucket]] occupancy cap applies
    * (same rule as the warehouse `band_signatures` artifact): an
    * uncapped static side would let one boilerplate mega-bucket fan
    * every colliding stream row out by the bucket's full occupancy. */
  def corpusBands(corpusShingled: DataFrame,
                  maxBucket: Int = TextDedup.LshMaxBucket): DataFrame =
    TextDedup.bandSignatures(corpusShingled, maxBucket)
      .select(col("doc_id").as("corpus_doc"), col("band"), col("band_key"))

  /** Flag streaming documents that near-duplicate the static corpus.
    * `streamDocs`: streaming (doc_id, text, ingest_ts). `corpusShingled`:
    * static (doc_id, shingles) — pass [[TextDedup.shingled]] of the
    * corpus, materialized. Emits one row per (incoming doc, corpus doc)
    * near-dup pair with its exact jaccard ≥ `threshold`. */
  def flagAgainstCorpus(streamDocs: DataFrame, corpusShingled: DataFrame,
                        threshold: Double = 0.5,
                        watermark: String = "1 hour"): DataFrame = {
    val bands = corpusBands(corpusShingled)
    val streamBands = streamDocs
      .withColumn("shingles", TextDedup.shingleExpr("text"))
      .withColumn("sig", TextDedup.minhashExpr("shingles"))
      .select(col("doc_id"), col("ingest_ts"), col("shingles"),
        explode(expr(
          s"""transform(sequence(0, ${TextDedup.LshBands - 1}), b -> struct(b AS band,
             |  concat_ws('_', element_at(sig, 2*b + 1), element_at(sig, 2*b + 2)) AS band_key))"""
            .stripMargin)).as("bk"))
      .select(col("doc_id"), col("ingest_ts"), col("shingles"),
        col("bk.band"), col("bk.band_key"))
    streamBands
      .join(bands, Seq("band", "band_key")) // stream-static: stateless
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("doc_id", "corpus_doc")
      .join(corpusShingled.select(col("doc_id").as("corpus_doc"),
        col("shingles").as("corpus_shingles")), Seq("corpus_doc"))
      .withColumn("inter", size(array_intersect(col("shingles"), col("corpus_shingles"))))
      .withColumn("uni", size(col("shingles")) + size(col("corpus_shingles")) - col("inter"))
      .withColumn("jaccard",
        when(col("uni") > 0, col("inter").cast("double") / col("uni").cast("double")))
      .where(col("jaccard") >= threshold)
      .select(col("doc_id"), col("corpus_doc"), col("jaccard"), col("ingest_ts"))
  }
}
