package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.functions.PortableHash
import graft.operators.Hll
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamHllSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def hashed(rows: Seq[(String, String)]) =
    rows.toDF("k", "v").select(col("k"), PortableHash.h60(col("v")).as("h"))

  test("stream-built registers equal batch registers; merged windows finalize identically") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String, Timestamp)]
    val out = StreamHll.windowedRegisters(
      in.toDF.toDF("k", "v", "ingest_ts")
        .select(col("k"), PortableHash.h60(col("v")).as("h"), col("ingest_ts")),
      "k", "h")
    val q = out.writeStream.format("memory").queryName("stream_hll")
      .outputMode(OutputMode.Append()).start()
    try {
      val hour1 = (1 to 500).map(i => ("s", s"tok$i", ts(f"2024-01-01 10:${i % 60}%02d:00")))
      val hour2 = (300 to 900).map(i => ("s", s"tok$i", ts(f"2024-01-01 11:${i % 60}%02d:00")))
      in.addData(hour1 ++ hour2: _*)
      in.addData(("s", "later", ts("2024-01-01 14:00:00")))
      q.processAllAvailable()

      val win = spark.table("stream_hll")
      def winRegs(t: String) = win.where($"window_start" === ts(t))
        .select($"k", $"reg", $"m_j")

      // per-window registers ≡ batch registers over the same rows
      val batch1 = Hll.registers(hashed(hour1.map(r => (r._1, r._2))), "k", "h")
      assert(rowsOf(winRegs("2024-01-01 10:00:00")) == rowsOf(batch1))

      // windows merged register-wise ≡ batch over the union, and the
      // finalized integer estimates agree exactly
      val merged = Hll.merge(
        winRegs("2024-01-01 10:00:00"), winRegs("2024-01-01 11:00:00"), "k")
      val whole = Hll.registers(
        hashed((hour1 ++ hour2).map(r => (r._1, r._2))), "k", "h")
      assert(rowsOf(merged) == rowsOf(whole))
      assert(rowsOf(Hll.estimate(merged, "k")) == rowsOf(Hll.estimate(whole, "k")))
    } finally q.stop()
  }

  test("state is the sketch: registers per window bounded by M") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String, Timestamp)]
    val out = StreamHll.windowedRegisters(
      in.toDF.toDF("k", "v", "ingest_ts")
        .select(col("k"), PortableHash.h60(col("v")).as("h"), col("ingest_ts")),
      "k", "h")
    val q = out.writeStream.format("memory").queryName("stream_hll_bound")
      .outputMode(OutputMode.Append()).start()
    try {
      val many = (0 until 5000).map(i => ("s", s"u$i", ts(f"2024-01-01 10:${i % 60}%02d:00")))
      in.addData(many: _*)
      in.addData(("s", "later", ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      val regs = spark.table("stream_hll_bound")
        .where($"window_start" === ts("2024-01-01 10:00:00")).count()
      assert(regs <= Hll.M, s"regs=$regs must be bounded by M=${Hll.M}")
    } finally q.stop()
  }
}
