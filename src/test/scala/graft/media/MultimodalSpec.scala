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
