package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamPackSpec extends SparkSpec {
  import spark.implicits._
  import StreamPack._

  private def runBatches(budget: Long, batches: Seq[Seq[DocTokens]]): Map[Long, Long] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DocTokens]
    val q = packByBudget(spark, in.toDS(), budget)
      .writeStream.format("memory").queryName("stream_pack")
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      spark.table("stream_pack").collect()
        .map(r => r.getLong(1) -> r.getLong(3)).toMap
    } finally q.stop()
  }

  test("greedy first-fit: overflow closes the pack; oversize doc gets its own pack") {
    // budget 10: [4,5] pack 0; 6 overflows → pack 1; 25 oversize → pack 2; 3 → pack 3
    val got = runBatches(10L, Seq(Seq(
      DocTokens("web", 1L, 4L), DocTokens("web", 2L, 5L),
      DocTokens("web", 3L, 6L), DocTokens("web", 4L, 25L),
      DocTokens("web", 5L, 3L))))
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
  }

  test("state carries the open pack across micro-batches") {
    val got = runBatches(10L, Seq(
      Seq(DocTokens("web", 1L, 4L)),               // pack 0 holds 4
      Seq(DocTokens("web", 2L, 5L)),               // still fits pack 0 (9)
      Seq(DocTokens("web", 3L, 2L))))              // overflows → pack 1
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("sources pack independently") {
    val got = runBatches(10L, Seq(Seq(
      DocTokens("a", 1L, 9L), DocTokens("b", 2L, 9L),
      DocTokens("a", 3L, 9L), DocTokens("b", 4L, 2L))))
    // each source: first doc pack 0, second overflows/fits per source
    assert(got(1L) == 0L && got(2L) == 0L && got(3L) == 1L && got(4L) == 1L)
  }
}
