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

  case class ResizedMedia(doc_id: Long, width: Int, height: Int, media: Array[Byte])
  case class FrameSample(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB resize: a real deployment decodes, scales, re-encodes; the
    * deterministic stand-in truncates the payload proportionally to the
    * target area so output sizes are testable. Same mapPartitions
    * shape as [[decodeFeatures]]. */
  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("meta.kind").as("kind")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val n = math.max(1, math.min(r.media.length, (w.toLong * h / 2048).toInt))
          ResizedMedia(r.doc_id, w, h, java.util.Arrays.copyOf(r.media, n))
        }
      }
  }

  /** STUB frame sampling (video → every k-th frame): slices the payload
    * into fixed-size pseudo-frames and keeps every `stride`-th one. One
    * input row fans out to many frame rows — the flatMap shape any real
    * frame sampler has. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int = 64, stride: Int = 4): Dataset[FrameSample] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("meta.kind").as("kind")).as[MediaRow]
      .flatMap { r =>
        r.media.grouped(frameBytes).zipWithIndex.collect {
          case (frame, idx) if idx % stride == 0 => FrameSample(r.doc_id, idx, frame)
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

  /** Payload-level near-duplicate pairs — perceptual-hash dedup for
    * multimodal columns: a SimHash over the payload's sliding 8-unit
    * grams (no tokenization — works on any byte/char stream, unlike the
    * word-shingle variant in [[graft.text.TextDedup]]), candidates via
    * the same hamming chunk buckets (perfect recall ≤ 3). A real
    * deployment hashes decoded pixels/samples instead of raw units —
    * the sketch-join shape is identical.
    *
    * Grams here are CHAR windows of the payload's text form, because
    * both engines index strings by code point — byte windows would
    * diverge on multibyte payloads between Spark substring and DuckDB
    * substr; the oracle mirrors this exactly. Payloads shorter than one
    * gram have no sketch and are exact-dedup's job (q12). */
  def payloadNearDup(docs: DataFrame, maxHam: Int = 3): DataFrame = {
    val fp = graft.Par.fanOut(docs)
      .where(length(col("text")) >= 8)
      .select(col("doc_id"), expr(
        """simhash32(array_distinct(transform(
          |  sequence(1, length(text) - 7),
          |  i -> CAST(conv(substring(md5(substring(text, i, 8)), 1, 15), 16, 10)
          |       AS BIGINT))))""".stripMargin).as("simhash"))
    graft.text.TextDedup.simhashPairs(fp, maxHam)
  }
}
