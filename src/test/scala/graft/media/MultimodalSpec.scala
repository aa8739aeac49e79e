package graft.media

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def docs =
    spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))

  test("media table carries opaque binary payloads with typed metadata") {
    val media = Multimodal.mediaTable(docs)
    val row = media.orderBy("doc_id").head()
    assert(row.schema("media").dataType.typeName == "binary")
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getAs[String]("kind") == "text/plain")
    assert(meta.getAs[Int]("n_bytes") > 0)
  }

  test("resize and frame-sample stubs keep the batch shape and fan out deterministically") {
    val media = Multimodal.mediaTable(docs)
    val resized = Multimodal.resize(spark, media, 320, 240).collect()
    assert(resized.length == docs.count())
    resized.foreach { r =>
      assert(r.width == 320 && r.height == 240)
      assert(r.media.length <= 320 * 240 / 2048 && r.media.length >= 1)
    }
    val frames = Multimodal.sampleFrames(spark, media, frameBytes = 64, stride = 4)
    val byDoc = frames.collect().groupBy(_.doc_id)
    assert(byDoc.nonEmpty)
    byDoc.values.foreach { fs =>
      assert(fs.map(_.frame_idx).forall(_ % 4 == 0)) // only every 4th frame kept
      assert(fs.forall(_.frame.length <= 64))
    }
  }

  test("partition-local decode produces deterministic features of the right shape") {
    val feats = Multimodal.decodeFeatures(spark, Multimodal.mediaTable(docs))
    val rows = feats.collect()
    assert(rows.length == docs.count())
    rows.foreach { f =>
      assert(f.width >= 1 && f.width <= 640 && f.height >= 1 && f.height <= 480)
      assert(f.feature.length == 8)
      // histogram is L1-normalized over payload bytes
      assert(math.abs(f.feature.sum - 1.0f) < 1e-3)
    }
    // determinism across runs
    val again = Multimodal.decodeFeatures(spark, Multimodal.mediaTable(docs))
      .collect().map(f => f.doc_id -> (f.width, f.height)).toMap
    rows.foreach(f => assert(again(f.doc_id) == ((f.width, f.height))))
  }
}
