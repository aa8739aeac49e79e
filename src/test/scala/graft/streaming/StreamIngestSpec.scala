package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.types._
import java.nio.file.Files

/** File-source streaming ingest: drain-available-now semantics and
  * exactly-once across restarts (the checkpoint replaces the sensor). */
class StreamIngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("title", StringType)))

  test("drains new csv files exactly once across invocations") {
    val base = Files.createTempDirectory("graft_stream").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(in))

    Files.writeString(java.nio.file.Paths.get(s"$in/products_1.csv"), "id,title\np1,widget\np2,gadget\n")
    val q1 = StreamIngest.drainToParquet(
      StreamIngest.readCsvStream(spark, in, schema, "2019-01-01 00:00:00"), out, ckpt)
    q1.awaitTermination()
    assert(spark.read.parquet(out).count() == 2)

    // second file lands; a new drain picks up ONLY the new file
    Files.writeString(java.nio.file.Paths.get(s"$in/products_2.csv"), "id,title\np3,sprocket\n")
    val q2 = StreamIngest.drainToParquet(
      StreamIngest.readCsvStream(spark, in, schema, "2019-01-02 00:00:00"), out, ckpt)
    q2.awaitTermination()
    val all = spark.read.parquet(out)
    assert(all.count() == 3)
    assert(all.select("processed_time").distinct().count() == 2)
  }
}
