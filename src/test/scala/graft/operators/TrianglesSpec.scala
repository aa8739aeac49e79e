package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
    Triangles.perNode(nodes.toDF("id"), edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  /** Brute-force: for each node, count unordered neighbor pairs that
    * are themselves adjacent. */
  private def brute(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] = {
    val adj = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    nodes.map { v =>
      val nb = adj.getOrElse(v, Set.empty)
      val d = nb.size.toLong
      val tri = nb.toSeq.combinations(2).count { case Seq(x, y) => adj(x).contains(y) }.toLong
      val cc = if (d >= 2) 2 * tri * 1000000L / (d * (d - 1)) else 0L
      v -> ((d, tri, cc))
    }.toMap
  }

  test("one triangle plus a pendant edge and a singleton") {
    val nodes = Seq(1L, 2L, 3L, 4L, 9L)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val got = run(nodes, edges)
    assert(got(1L) == ((2L, 1L, 1000000L))) // closed neighborhood: cc = 1
    assert(got(2L) == ((2L, 1L, 1000000L)))
    assert(got(3L) == ((3L, 1L, 333333L))) // 2*1e6/6 floored
    assert(got(4L) == ((1L, 0L, 0L)))
    assert(got(9L) == ((0L, 0L, 0L)))
  }

  test("K4 clique: every node sits in C(3,2)=3 triangles at cc=1") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val edges = for (a <- nodes; b <- nodes if a < b) yield (a, b)
    val got = run(nodes, edges)
    nodes.foreach(v => assert(got(v) == ((3L, 3L, 1000000L)), s"node $v"))
  }

  test("matches brute force on random graphs (incl. skewed-degree stars)") {
    val gen = for {
      n <- Gen.choose(2, 10)
      m <- Gen.choose(0, 20)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield (n, es.filter { case (a, b) => a != b })
    val prop = Prop.forAllNoShrink(gen) { case (n, es) =>
      val nodes = (0L until n.toLong).toSeq
      run(nodes, es) == brute(nodes, es)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withInitialSeed(Seed(107L)), prop)
    assert(res.passed, res.status.toString)
  }
}
