package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run batch "decode /
  * feature-extract" stages as partition-local transforms over a REAL
  * codec ([[PpmCodec]], binary P6 — fixed header + raw pixels, no deps):
  *  - schema: (doc_id LONG, media BINARY, meta STRUCT<n_bytes, kind>)
  *  - partition-local batch processing via `mapPartitions` over a typed
  *    Dataset (the JVM analog of arrow-batched python UDFs): one
  *    decoder init per partition, streamed row iteration, no
  *    driver-side collection;
  *  - decode / resize / frame-sample all parse the payload's header and
  *    operate on decoded PIXELS (true byte→pixel semantics; a malformed
  *    payload throws, it does not hash quietly);
  *  - feature output as `Array[Float]`, ready for
  *    [[graft.vector.Similarity]] consumption.
  *
  * The container has no image CORPUS, so [[mediaTable]] synthesizes the
  * payloads: each document's utf-8 text bytes become the RGB raster of a
  * 16-pixel-wide P6 image ('.'-padded to fill the last row — printable,
  * so the DuckDB oracles can rebuild the exact bytes in SQL and every
  * digest is replayed hex-exactly). The synthesis is the only fake; the
  * codec path those payloads flow through is the real one.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte], kind: String)
  case class MediaFeatures(doc_id: Long, width: Int, height: Int, feature: Array[Float])

  /** Raster width of synthesized payloads: 16 px × 3 bytes = 48-byte
    * rows, the frame unit [[sampleFrames]] slices on. */
  val SynthWidth = 16
  private val RowBytes = SynthWidth * 3
  private val PadByte = '.'.toByte // printable → oracle-reproducible

  /** Text bytes → real P6 payload (see object doc). */
  def synthesizePpm(text: String): Array[Byte] = {
    val tb = text.getBytes("UTF-8")
    val h = math.max(1, (tb.length + RowBytes - 1) / RowBytes)
    val pixels = java.util.Arrays.copyOf(tb, RowBytes * h)
    java.util.Arrays.fill(pixels, tb.length, pixels.length, PadByte)
    PpmCodec.encode(SynthWidth, h, pixels)
  }

  /** Corpus adapter: synthesize a REAL decodable P6 payload from each
    * document's text bytes — the encode side of the codec running in
    * the same partition-local batch shape as every decode stage. */
  def mediaTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows => // codec init once per partition
        rows.map { case (id, text) =>
          val payload = synthesizePpm(text)
          (id, payload, payload.length, "image/ppm")
        }
      }
      .toDF("doc_id", "media", "n_bytes", "kind")
      .select(col("doc_id"), col("media"),
        struct(col("n_bytes"), col("kind")).as("meta"))
  }

  /** Partition-local decode + feature extraction: the shape of every
    * multimodal batch stage. Dimensions come from the parsed header;
    * the 8-dim "embedding" is an L1-normalized byte histogram over the
    * DECODED raster (not the payload — header bytes don't leak in). */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("meta.kind").as("kind"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, pixels) = PpmCodec.decode(r.media)
          val hist = new Array[Float](8)
          pixels.foreach(b => hist(math.floorMod(b, 8)) += 1f)
          val n = math.max(pixels.length, 1).toFloat
          MediaFeatures(r.doc_id, w, h, hist.map(_ / n))
        }
      }
  }

  case class ResizedMedia(doc_id: Long, width: Int, height: Int, media: Array[Byte])
  case class FrameSample(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Real resize: decode, nearest-neighbor resample to `w`×`h`
    * ([[PpmCodec.resizePixels]]), re-encode. Same mapPartitions shape
    * as [[decodeFeatures]]; output payloads are themselves valid P6. */
  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("meta.kind").as("kind")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (w0, h0, px) = PpmCodec.decode(r.media)
          ResizedMedia(r.doc_id, w, h,
            PpmCodec.encode(w, h, PpmCodec.resizePixels(w0, h0, px, w, h)))
        }
      }
  }

  /** Frame sampling (video → every `stride`-th frame): each RASTER ROW
    * of the decoded image is one w×1 frame (raw RGB row bytes); keep
    * every `stride`-th. One input row fans out to many frame rows —
    * the flatMap shape any real frame sampler has, over real decoded
    * pixels. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   stride: Int = 4): Dataset[FrameSample] = {
    import spark.implicits._
    require(stride >= 1, "stride must be positive")
    media.select(col("doc_id"), col("media"), col("meta.kind").as("kind")).as[MediaRow]
      .flatMap { r =>
        val (w, h, px) = PpmCodec.decode(r.media)
        val rowBytes = w * 3
        (0 until h).collect {
          case y if y % stride == 0 =>
            FrameSample(r.doc_id, y,
              java.util.Arrays.copyOfRange(px, y * rowBytes, (y + 1) * rowBytes))
        }
      }
  }

  /** Decode audit over the media table — dimensions from the PARSED
    * header plus payload and raster digests. Digests go over the hex
    * form because the oracle engine rebuilds the byte layout as hex
    * strings (both engines emit uppercase hex, so header bytes, pad
    * bytes and mid-codepoint splits match bit for bit). */
  def mediaStats(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    mediaTable(docs)
      .select(col("doc_id"), col("media"), col("meta.kind").as("kind")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, px) = PpmCodec.decode(r.media)
          (r.doc_id, w, h, r.media, px)
        }
      }
      .toDF("doc_id", "width", "height", "payload", "pixels")
      .select(col("doc_id"), col("width"), col("height"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(hex(col("payload"))).as("content_md5"),
        md5(hex(col("pixels"))).as("pixel_md5"))
      .orderBy("doc_id")
  }

  case class QuarantinedDecode(doc_id: Long, ok: Boolean, err_kind: String,
                               width: Int, height: Int, n_pixel_bytes: Long)

  /** Deterministic corruption plant for the quarantine path: at 100 TB
    * corrupt blobs are a certainty, so the synthesized corpus carries
    * them BY RULE (oracle-replayable) — `doc_id % 13 == 5` truncates the
    * payload to its first 10 bytes (magic intact, header/raster gone);
    * `doc_id % 13 == 9` flips the magic byte. Every other payload stays
    * the valid P6 [[mediaTable]] emits. */
  def corruptPayload(id: Long, payload: Array[Byte]): Array[Byte] =
    if (id % 13 == 5) java.util.Arrays.copyOf(payload, 10)
    else if (id % 13 == 9) { val p = payload.clone(); p(0) = 'X'.toByte; p }
    else payload

  /** [[mediaTable]] with the corruption plant applied — the fixture
    * every quarantine stage runs over. */
  def mediaTableWithFaults(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val payload = corruptPayload(id, synthesizePpm(text))
          (id, payload, payload.length, "image/ppm")
        }
      }
      .toDF("doc_id", "media", "n_bytes", "kind")
      .select(col("doc_id"), col("media"),
        struct(col("n_bytes"), col("kind")).as("meta"))
  }

  /** PERMISSIVE decode — the 100 TB posture for untrusted payloads:
    * [[PpmCodec.decode]] throws by design (specs must fail loudly), but
    * one corrupt blob must not fail a million-row stage, so this wraps
    * the codec per row and turns malformed payloads into QUARANTINE
    * rows (ok = false, coarse error class `bad_magic` | `malformed`,
    * sentinel −1 dimensions) instead of a stage abort — the dead-letter
    * twin of a PERMISSIVE-mode CSV read's corrupt-record column
    * ([[graft.sources.Ingest]] documents the same pattern for text
    * ingest). Healthy rows carry parsed dimensions and raster size. */
  def decodeQuarantine(spark: SparkSession, media: DataFrame): Dataset[QuarantinedDecode] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("meta.kind").as("kind"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          try {
            val (w, h, px) = PpmCodec.decode(r.media)
            QuarantinedDecode(r.doc_id, ok = true, "ok", w, h, px.length.toLong)
          } catch {
            case e: IllegalArgumentException =>
              val kind =
                if (Option(e.getMessage).exists(_.contains("magic"))) "bad_magic"
                else "malformed"
              QuarantinedDecode(r.doc_id, ok = false, kind, -1, -1, 0L)
          }
        }
      }
  }

  /** Dead-letter audit over the faulted corpus: per (source, error
    * class), payload counts plus dimension/raster sums over the rows
    * that DECODED (quarantined rows contribute the −1 sentinels). The
    * counts are the monitor a pipeline alerts on — a source whose
    * quarantine share jumps is shipping garbage. */
  def quarantineAudit(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    decodeQuarantine(spark, mediaTableWithFaults(docs))
      .toDF()
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"), col("err_kind"))
      .agg(count(lit(1)).as("n_payloads"),
        sum(col("width")).cast("long").as("sum_width"),
        sum(col("height")).cast("long").as("sum_height"),
        sum(col("n_pixel_bytes")).as("sum_pixel_bytes"))
      .orderBy("source", "err_kind")
  }

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
          |  i -> md5_prefix(substring(text, i, 8), 15))))""".stripMargin)
        .as("simhash"))
    graft.text.TextDedup.simhashPairs(fp, maxHam)
  }
}
