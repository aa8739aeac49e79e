package graft.vector

import graft.SparkSpec

class ScalarQuantSpec extends SparkSpec {
  import spark.implicits._

  private def run(vecs: Seq[(Long, Seq[Float], Int)]): Map[Int, (Long, Long, Long)] =
    ScalarQuant.reconstructionAudit(vecs.toDF("vec_id", "embedding", "label"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  /** Driver-side double replay with the same association order. */
  private def replay(vecs: Seq[(Long, Seq[Float], Int)]): Map[Int, (Long, Long, Long)] = {
    val dims = vecs.head._2.length
    val cols = (0 until dims).map(p => vecs.map(_._2(p).toDouble))
    val mn = cols.map(_.min); val mx = cols.map(_.max)
    val byLabel = vecs.groupBy(_._3)
    byLabel.map { case (label, vs) =>
      val sumErr = vs.map { case (_, v, _) =>
        (0 until dims).map { p =>
          val d = v(p).toDouble
          if (mx(p) > mn(p)) {
            val code = math.min(255L, math.floor((d - mn(p)) * 255.0 / (mx(p) - mn(p))).toLong)
            val recon = mn(p) + (code.toDouble + 0.5) * (mx(p) - mn(p)) / 255.0
            math.floor((d - recon) * (d - recon) * ScalarQuant.ErrScale.toDouble).toLong
          } else 0L
        }.sum
      }.sum
      label -> ((vs.size.toLong, sumErr, sumErr / vs.size))
    }
  }

  test("constant dimensions reconstruct exactly (zero error)") {
    val vecs = Seq((1L, Seq(0.5f, 2.0f), 0), (2L, Seq(0.5f, 2.0f), 0))
    assert(run(vecs) == Map(0 -> ((2L, 0L, 0L))))
  }

  test("matches a driver-side double replay on mixed-label input") {
    val vecs = Seq(
      (1L, Seq(0.0f, 1.0f, -0.5f), 0),
      (2L, Seq(1.0f, 0.0f, 0.25f), 0),
      (3L, Seq(0.5f, 0.5f, 0.0f), 1),
      (4L, Seq(0.25f, 0.75f, 1.0f), 1),
      (5L, Seq(0.125f, 0.875f, -1.0f), 1))
    assert(run(vecs) == replay(vecs))
  }

  test("error is small relative to the quantization bin width") {
    // max per-dim |err| is half a bin: (range/255/2)^2 per cell
    val vecs = (1L to 20L).map(i =>
      (i, Seq((i % 7).toFloat / 7f, (i % 5).toFloat / 5f, (i % 3).toFloat / 3f), 0))
    val (n, sum, _) = run(vecs)(0)
    val maxCell = math.pow(1.0 / 255.0, 2) * ScalarQuant.ErrScale // range = 1 per dim
    assert(n == 20L)
    assert(sum <= (maxCell * 3 * 20).toLong, s"sum_err_fix $sum above half-bin bound")
  }
}
