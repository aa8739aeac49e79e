package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run batch "decode /
  * feature-extract" stages as partition-local transforms.
  *
  * The container has no image/audio codecs, so the decoder itself is a
  * clearly marked DETERMINISTIC STUB ([[stubDecode]]) — what is real and
  * tested is everything Spark cares about at 100 TB:
  *  - schema: (doc_id LONG, media BINARY, meta STRUCT<n_bytes, kind>)
  *  - partition-local batch processing via `mapPartitions` over a typed
  *    Dataset (the JVM analog of arrow-batched python UDFs): one
  *    decoder init per partition, streamed row iteration, no
  *    driver-side collection;
  *  - feature output as `Array[Float]`, ready for
  *    [[graft.vector.Similarity]] consumption.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte], kind: String)
  case class MediaFeatures(doc_id: Long, width: Int, height: Int, feature: Array[Float])

  /** Corpus adapter: re-use document text bytes as a stand-in binary
    * payload (utf-8 encode) — the plumbing neither knows nor cares that
    * the bytes aren't a real JPEG. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("media"),
      struct(
        octet_length(col("text")).as("n_bytes"),
        lit("text/plain").as("kind")).as("meta"))

  /** STUB decoder: a real deployment calls the codec here (one init per
    * partition). Deterministic fake: dimensions and features derived
    * from the payload bytes so tests are reproducible. */
  def stubDecode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val h = java.util.Arrays.hashCode(payload)
    val w = math.floorMod(h, 640) + 1
    val ht = math.floorMod(h >> 16, 480) + 1
    // 8-dim "embedding": byte histogram over 8 buckets, L1-normalized
    val hist = new Array[Float](8)
    payload.foreach(b => hist(math.floorMod(b, 8)) += 1f)
    val n = math.max(payload.length, 1).toFloat
    (w, ht, hist.map(_ / n))
  }

  /** Partition-local decode + feature extraction: the shape of every
    * multimodal batch stage (decode, resize, frame-sample, embed). */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("meta.kind").as("kind"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // decoder/codec init would happen ONCE here, per partition
        rows.map { r =>
          val (w, h, feat) = stubDecode(r.media)
          MediaFeatures(r.doc_id, w, h, feat)
        }
      }
  }

  /** Oracle-checkable stats over the binary payload — byte length and
    * md5 content digest are portable (identical on any engine). */
  def mediaStats(docs: DataFrame): DataFrame =
    mediaTable(docs).select(
      col("doc_id"),
      col("meta.n_bytes").as("n_bytes"),
      md5(col("media")).as("content_md5"))
      .orderBy("doc_id")
}
