package graft.vector

import graft.SparkSpec

class RrfSpec extends SparkSpec {
  import spark.implicits._

  private def list(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("qid", "rank", "nid")

  test("consensus beats a single first place; micros are exact") {
    val l1 = list((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L))
    val l2 = list((1L, 1L, 20L), (1L, 2L, 10L), (1L, 3L, 13L))
    val fused = Similarity.rrfFuse(Seq(l1, l2)).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // nid 10: 10^6 div 61 + 10^6 div 62 = 16393 + 16129 = 32522 — a
    // rank-1+rank-2 consensus beats nid 20's lone rank-1 16393
    assert(fused.toSeq == Seq((1L, 10L, 32522L), (2L, 20L, 16393L), (3L, 11L, 16129L)))
  }

  test("rrf ties break on the lower nid") {
    val l1 = list((1L, 1L, 30L), (1L, 2L, 40L))
    val l2 = list((1L, 1L, 40L), (1L, 2L, 30L))
    // both nids score 16393 + 16129 = 32522 → nid 30 first
    val fused = Similarity.rrfFuse(Seq(l1, l2), k = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(fused.toSeq == Seq((1L, 30L), (2L, 40L)))
  }

  test("single-list fusion preserves the list's own order") {
    val l1 = list((1L, 1L, 5L), (1L, 2L, 6L), (1L, 3L, 7L), (2L, 1L, 9L))
    val fused = Similarity.rrfFuse(Seq(l1)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fused.toSeq == Seq((1L, 1L, 5L), (1L, 2L, 6L), (1L, 3L, 7L), (2L, 1L, 9L)))
  }
}
