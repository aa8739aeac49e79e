package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.minLabel(
      nodes.toDF("id"),
      edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain collapses to its min id across multiple rounds") {
    // 1-2-3-4-5 needs diameter-many propagation rounds, not one
    val got = run(Seq(1L, 2L, 3L, 4L, 5L, 9L), Seq((5L, 4L), (3L, 4L), (2L, 3L), (1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 9L -> 9L))
  }

  test("two components stay separate; duplicate and reversed edges are harmless") {
    val got = run(Seq(1L, 2L, 3L, 10L, 11L),
      Seq((2L, 1L), (1L, 2L), (2L, 3L), (11L, 10L), (11L, 10L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("no edges → every node is its own singleton component") {
    val got = run(Seq(7L, 8L), Seq.empty)
    assert(got == Map(7L -> 7L, 8L -> 8L))
  }

  test("chainCut splits a weak-link chain and leaves a strong clique whole") {
    // cluster {1,2,3}: 1~2 strong (0.9), 2~3 WEAK (0.6) — a drift chain
    //   whose endpoints 1,3 were never verified → cut splits {1,2} | {3}
    // cluster {10,11}: one strong edge → survives intact, was_split=0
    // singleton 20: multi-member filter drops it from the report
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("id")
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.6), (10L, 11L, 0.85))
      .toDF("doc_a", "doc_b", "jaccard")
    val clusters = Components.minLabel(nodes,
        pairs.select($"doc_a".as("src"), $"doc_b".as("dst")))
      .select($"id".as("doc_id"), $"component".as("cluster_id"))
    val got = Components.chainCut(nodes, clusters, pairs)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
    assert(got == Map(
      1L -> ((1L, 1L, 1)), 2L -> ((1L, 1L, 1)), 3L -> ((1L, 3L, 1)),
      10L -> ((10L, 10L, 0)), 11L -> ((10L, 10L, 0))))
  }

  test("chainCut at the exact ppm boundary keeps the threshold edge") {
    // floor(0.8 * 1e6) = 800000 ≥ threshold — boundary edges are STRONG
    val nodes = Seq(1L, 2L).toDF("id")
    val pairs = Seq((1L, 2L, 0.8)).toDF("doc_a", "doc_b", "jaccard")
    val clusters = Components.minLabel(nodes,
        pairs.select($"doc_a".as("src"), $"doc_b".as("dst")))
      .select($"id".as("doc_id"), $"component".as("cluster_id"))
    val got = Components.chainCut(nodes, clusters, pairs)
      .collect().map(r => (r.getLong(0), r.getInt(3))).toMap
    assert(got == Map(1L -> 0, 2L -> 0))
  }

  test("matches brute-force union-find on random graphs") {
    val gen = for {
      n <- Gen.choose(1, 12)
      m <- Gen.choose(0, 14)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield (n, es.filter { case (a, b) => a != b })
    val prop = Prop.forAllNoShrink(gen) { case (n, es) =>
      val nodes = (0L until n.toLong).toSeq
      // driver-side union-find oracle (union-by-min keeps the root = min id)
      val parent = scala.collection.mutable.Map(nodes.map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = nodes.map(i => i -> find(i)).toMap
      run(nodes, es) == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withInitialSeed(Seed(35L)), prop)
    assert(res.passed, res.status.toString)
  }
}
