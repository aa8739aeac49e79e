package graft.media

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def docs =
    spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))

  test("media table carries REAL decodable P6 payloads with typed metadata") {
    val media = Multimodal.mediaTable(docs)
    val row = media.orderBy("doc_id").head()
    assert(row.schema("media").dataType.typeName == "binary")
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getAs[String]("kind") == "image/ppm")
    val payload = row.getAs[Array[Byte]]("media")
    assert(meta.getAs[Int]("n_bytes") == payload.length)
    // the payload decodes with the real codec and round-trips the text
    val (w, h, px) = PpmCodec.decode(payload)
    assert(w == Multimodal.SynthWidth && h >= 1 && px.length == w * h * 3)
    val text = docs.orderBy("doc_id").head().getString(1)
    assert(new String(px.take(text.getBytes("UTF-8").length), "UTF-8") == text)
    assert(px.drop(text.getBytes("UTF-8").length).forall(_ == '.'.toByte))
  }

  test("resize really resamples pixels: output is valid P6 at the target size") {
    val media = Multimodal.mediaTable(docs)
    val resized = Multimodal.resize(spark, media, 8, 5).collect()
    assert(resized.length == docs.count())
    resized.foreach { r =>
      assert(r.width == 8 && r.height == 5)
      val (w, h, px) = PpmCodec.decode(r.media) // output is itself decodable
      assert(w == 8 && h == 5 && px.length == 8 * 5 * 3)
    }
    // nearest-neighbor at source size is the identity on pixels
    val id = Multimodal.resize(spark, media.limit(1), Multimodal.SynthWidth,
      PpmCodec.decode(media.head().getAs[Array[Byte]]("media"))._2).head()
    assert(java.util.Arrays.equals(
      PpmCodec.decode(id.media)._3,
      PpmCodec.decode(media.head().getAs[Array[Byte]]("media"))._3))
  }

  test("frame sampling slices decoded raster rows, every stride-th") {
    val media = Multimodal.mediaTable(docs)
    val frames = Multimodal.sampleFrames(spark, media, stride = 4)
    val byDoc = frames.collect().groupBy(_.doc_id)
    assert(byDoc.nonEmpty)
    byDoc.values.foreach { fs =>
      assert(fs.map(_.frame_idx).forall(_ % 4 == 0)) // only every 4th row kept
      assert(fs.forall(_.frame.length == Multimodal.SynthWidth * 3))
    }
    // frame 0 of a known doc == first 48 pixel bytes of its decoded raster
    val first = media.orderBy("doc_id").head()
    val px = PpmCodec.decode(first.getAs[Array[Byte]]("media"))._3
    val f0 = byDoc(first.getLong(0)).minBy(_.frame_idx)
    assert(java.util.Arrays.equals(f0.frame, px.take(Multimodal.SynthWidth * 3)))
  }

  test("partition-local decode produces header dimensions and raster features") {
    val feats = Multimodal.decodeFeatures(spark, Multimodal.mediaTable(docs))
    val rows = feats.collect()
    assert(rows.length == docs.count())
    rows.foreach { f =>
      assert(f.width == Multimodal.SynthWidth && f.height >= 1)
      assert(f.feature.length == 8)
      // histogram is L1-normalized over decoded raster bytes
      assert(math.abs(f.feature.sum - 1.0f) < 1e-3)
    }
    // determinism across runs
    val again = Multimodal.decodeFeatures(spark, Multimodal.mediaTable(docs))
      .collect().map(f => f.doc_id -> (f.width, f.height)).toMap
    rows.foreach(f => assert(again(f.doc_id) == ((f.width, f.height))))
  }

  test("permissive decode quarantines planted corrupt payloads, never throws") {
    val planted = Seq(
      (1L, "healthy text payload one"),
      (5L, "this one gets truncated"),       // 5 % 13 == 5 → malformed
      (9L, "this one gets a flipped magic"), // 9 % 13 == 9 → bad_magic
      (13L, "healthy again after the modulus wraps"))
      .toDF("doc_id", "text")
    val out = Multimodal.decodeQuarantine(spark,
        Multimodal.mediaTableWithFaults(planted))
      .collect().map(q => q.doc_id -> q).toMap
    assert(out(1L).ok && out(1L).err_kind == "ok" && out(1L).width == 16)
    assert(!out(5L).ok && out(5L).err_kind == "malformed" && out(5L).width == -1)
    assert(!out(9L).ok && out(9L).err_kind == "bad_magic")
    assert(out(13L).ok)
    // the strict decode path THROWS on the same payloads (specs must
    // fail loudly; only the quarantine path degrades gracefully)
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFeatures(spark,
        Multimodal.mediaTableWithFaults(planted)).collect()
    }
  }

  test("quarantine audit counts dead-letter rows per source and error class") {
    val planted = Seq(
      (1L, "a", "healthy one"), (5L, "a", "truncated one"),
      (9L, "b", "bad magic one"), (14L, "b", "healthy two"))
      .toDF("doc_id", "source", "text")
    val rows = Multimodal.quarantineAudit(planted)
      .select("source", "err_kind", "n_payloads")
      .as[(String, String, Long)].collect().toSet
    assert(rows == Set(("a", "ok", 1L), ("a", "malformed", 1L),
      ("b", "bad_magic", 1L), ("b", "ok", 1L)))
  }
}
