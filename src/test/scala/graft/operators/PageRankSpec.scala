package graft.operators

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Long] =
    PageRank.ranks(nodes.toDF("id"), edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Driver-side integer replay of the same recurrence. */
  private def replay(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val deg = sym.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r = deg.keys.map(_ -> PageRank.Scale).toMap
    for (_ <- 1 to iters) {
      val msgs = sym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) =>
          r(src) * PageRank.DampNum / PageRank.DampDen / deg(src)
        }.sum
      }
      r = r.keys.map(v => v -> (PageRank.TeleportFix + msgs(v))).toMap
    }
    nodes.map(v => v -> r.getOrElse(v, PageRank.TeleportFix)).toMap
  }

  test("symmetric pair: both nodes keep full rank (damped stationary point)") {
    // 2-cycle with outdeg 1: r' = 150000 + (r*85 div 100), fixpoint from 1e6:
    // 1_000_000 → 1_000_000 every iteration.
    val got = run(Seq(1L, 2L), Seq((1L, 2L)))
    assert(got == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("star center outranks leaves; singleton holds teleport base") {
    val got = run(Seq(1L, 2L, 3L, 4L, 9L), Seq((1L, 2L), (1L, 3L), (1L, 4L)))
    assert(got(1L) > got(2L))
    assert(got(2L) == got(3L) && got(3L) == got(4L))
    assert(got(9L) == PageRank.TeleportFix)
    assert(got == replay(Seq(1L, 2L, 3L, 4L, 9L), Seq((1L, 2L), (1L, 3L), (1L, 4L)), 5))
  }

  test("matches the driver-side integer replay on an asymmetric graph") {
    val nodes = (0L to 7L).toSeq
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L), (4L, 5L), (5L, 6L))
    for (iters <- Seq(1, 3, 5))
      assert(run(nodes, edges, iters) == replay(nodes, edges, iters), s"iters=$iters")
  }

  private def runW(nodes: Seq[Long], edges: Seq[(Long, Long, Long)], iters: Int = 5): Map[Long, Long] =
    PageRank.ranksWeighted(nodes.toDF("id"), edges.toDF("src", "dst", "w"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("uniform weights reproduce the unweighted ranks") {
    val nodes = (0L to 5L).toSeq
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L), (4L, 5L))
    assert(runW(nodes, edges.map { case (a, b) => (a, b, 7L) }) == run(nodes, edges))
  }

  test("weighted ranks match a driver-side integer replay and favor heavy edges") {
    val nodes = Seq(1L, 2L, 3L, 9L)
    // node 1 splits outflow 9:1 between 2 and 3
    val edges = Seq((1L, 2L, 900000L), (1L, 3L, 100000L), (2L, 3L, 1L))
    val got = runW(nodes, edges)
    // driver replay of the same recurrence
    val sym = edges.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }.distinct
    val wt = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    var r = wt.keys.map(_ -> PageRank.Scale).toMap
    for (_ <- 1 to 5) {
      val msgs = sym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _, w) =>
          r(src) * PageRank.DampNum / PageRank.DampDen * w / wt(src)
        }.sum
      }
      r = r.keys.map(v => v -> (PageRank.TeleportFix + msgs(v))).toMap
    }
    val expected = nodes.map(v => v -> r.getOrElse(v, PageRank.TeleportFix)).toMap
    assert(got == expected)
    assert(got(2L) > got(3L)) // the 9:1 split shows up in the ranks
    assert(got(9L) == PageRank.TeleportFix)
  }

  test("duplicate and reversed input edges do not change ranks") {
    val nodes = Seq(1L, 2L, 3L)
    val base = run(nodes, Seq((1L, 2L), (2L, 3L)))
    val noisy = run(nodes, Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L), (3L, 2L)))
    assert(base == noisy)
  }
}
