package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamCentroidSpec extends SparkSpec {
  import spark.implicits._

  private val vecs: Seq[(Int, Array[Float])] = Seq(
    (0, Array(0.25f, -0.5f)),
    (0, Array(0.125f, 0.5f)),
    (1, Array(-0.25f, 0.0f)),
    (0, Array(0.0625f, 0.25f)),
    (1, Array(0.5f, -0.125f)))

  test("stream-folded centroid state equals batch state bit-for-bit, any batching") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Int, Array[Float])]
    val out = StreamCentroid.centroidState(in.toDF.toDF("label", "embedding"))
    val q = out.writeStream.format("memory").queryName("stream_centroid")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(vecs.take(2): _*) // uneven batch split on purpose
      q.processAllAvailable()
      in.addData(vecs.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_centroid")
        .as[(Int, Int, Long, Long)].collect().toSet
      val batch = StreamCentroid.centroidState(
          vecs.toDF("label", "embedding"))
        .as[(Int, Int, Long, Long)].collect().toSet
      assert(streamed.nonEmpty)
      assert(streamed == batch,
        s"stream state $streamed must equal batch state $batch")
    } finally q.stop()
  }

  test("state size is labels x dim regardless of stream length") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Int, Array[Float])]
    val out = StreamCentroid.centroidState(in.toDF.toDF("label", "embedding"))
    val q = out.writeStream.format("memory").queryName("stream_centroid_bound")
      .outputMode(OutputMode.Complete()).start()
    try {
      val many = (0 until 100).map(i => (i % 3, Array(0.1f * (i % 7), -0.2f)))
      in.addData(many: _*)
      q.processAllAvailable()
      assert(spark.table("stream_centroid_bound").count() == 3 * 2)
    } finally q.stop()
  }

  test("the derived centroid coordinate matches the batch formula") {
    val st = StreamCentroid.centroidState(vecs.toDF("label", "embedding"))
      .selectExpr("label", "pos", "cast(s div n as double) / 1048576.0 - 1 as c")
      .as[(Int, Int, Double)].collect().toMap2
    // label 0, pos 0: values 0.25, 0.125, 0.0625 (exact dyadics)
    // fix sums: floor(1.25*2^20)+floor(1.125*2^20)+floor(1.0625*2^20)
    val s = Seq(0.25, 0.125, 0.0625).map(v => math.floor((v + 1) * 1048576).toLong).sum
    assert(st((0, 0)) == (s / 3).toDouble / 1048576.0 - 1)
  }

  private implicit class MapOps(rows: Array[(Int, Int, Double)]) {
    def toMap2: Map[(Int, Int), Double] = rows.map(r => ((r._1, r._2), r._3)).toMap
  }
}
