package graft.vector

import graft.SparkSpec

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  /** One-cell assignment: every vector in cell 0, so the cell block is
    * a no-op and the audit degenerates to plain label blocking — the
    * shape the driver-side replay mirrors. */
  private def oneCell(vecs: Seq[(Long, Seq[Float], Int)]) =
    vecs.map { case (id, _, _) => (id, 0L, 1) }.toDF("vec_id", "cell", "rn")

  private def run(vecs: Seq[(Long, Seq[Float], Int)]): Map[Int, (Long, Long, Long)] =
    RandomProjection.distortionAudit(vecs.toDF("vec_id", "embedding", "label"),
        oneCell(vecs))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  /** Driver-side replay with the same association order. */
  private def replay(vecs: Seq[(Long, Seq[Float], Int)]): Map[Int, (Long, Long, Long)] = {
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    def proj(v: Seq[Double]) =
      (0 until RandomProjection.OutDims).map(j => dot(v, RandomProjection.signCol(j)))
    val pn = vecs.map { case (id, e, l) =>
      val v = e.map(_.toDouble)
      val p = proj(v)
      (id, l, v, p, math.sqrt(dot(v, v)), math.sqrt(dot(p, p)))
    }
    pn.groupBy(_._2).flatMap { case (label, vs) =>
      val errs = for {
        a <- vs; b <- vs
        if a._1 < b._1 && a._5 > 0 && b._5 > 0 && a._6 > 0 && b._6 > 0
      } yield {
        val co = dot(a._3, b._3) / (a._5 * b._5)
        val cp = dot(a._4, b._4) / (a._6 * b._6)
        math.floor(math.abs(co - cp) * 1000000.0).toLong
      }
      if (errs.isEmpty) None
      else Some(label -> ((errs.size.toLong, errs.sum / errs.size, errs.max)))
    }
  }

  private def unitVec(i: Int): Seq[Float] =
    Seq.tabulate(RandomProjection.InDims)(k => if (k == i) 1.0f else 0.0f)

  test("sign matrix is deterministic ±1") {
    val s = (0 until RandomProjection.InDims).flatMap(i =>
      (0 until RandomProjection.OutDims).map(j => RandomProjection.sign(i, j)))
    assert(s.forall(v => v == 1.0 || v == -1.0))
    assert(s.exists(_ == 1.0) && s.exists(_ == -1.0))
    assert(s == s.map(identity)) // stable across calls
  }

  test("matches a driver-side replay on one-hot and mixed vectors") {
    val vecs = Seq(
      (1L, unitVec(0), 0), (2L, unitVec(1), 0), (3L, unitVec(2), 0),
      (4L, Seq.tabulate(64)(k => (k % 5 - 2) / 3.0f), 1),
      (5L, Seq.tabulate(64)(k => (k % 7 - 3) / 4.0f), 1),
      (6L, Seq.tabulate(64)(_ => 0.25f), 1))
    assert(run(vecs) == replay(vecs))
  }

  test("cell blocking bounds the audit pairs: split cells pair nothing across") {
    val vecs = Seq(
      (1L, unitVec(0), 0), (2L, unitVec(1), 0), (3L, unitVec(2), 0))
    // 1/2 share cell 0; 3 sits alone in cell 1 → only the (1,2) pair
    val assign = Seq((1L, 0L, 1), (2L, 0L, 1), (3L, 1L, 1))
      .toDF("vec_id", "cell", "rn")
    val out = RandomProjection.distortionAudit(
        vecs.toDF("vec_id", "embedding", "label"), assign)
      .collect()
    assert(out.length == 1 && out.head.getLong(1) == 1L)
  }

  test("zero vectors are excluded from the pair audit") {
    val vecs = Seq(
      (1L, Seq.fill(64)(0.0f), 0),
      (2L, unitVec(3), 0),
      (3L, unitVec(4), 0))
    // only the (2,3) pair survives the norm guard
    assert(run(vecs)(0)._1 == 1L)
  }
}
