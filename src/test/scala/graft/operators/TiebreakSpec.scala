package graft.operators

import graft.SparkSpec

class TiebreakSpec extends SparkSpec {
  import spark.implicits._

  test("null-shifted and boundary-shifted rows get distinct synthesized tiebreaks") {
    val df = Seq(
      (Option("X"), Option.empty[String]), // (X, null)
      (Option.empty[String], Option("X")), // (null, X) — concat_ws would drop both nulls
      (Option("ab"), Option("c")),         // boundary shift pair
      (Option("a"), Option("bc")))
      .toDF("c1", "c2")
    val hashes = df.select(Tiebreak.synth(df)).as[Long].collect()
    assert(hashes.distinct.length == 4,
      s"all four rows must hash distinctly, got $hashes")
  }

  test("ensure is a no-op when a tiebreak column exists") {
    val df = Seq((1L, 9L)).toDF("id", "tiebreak")
    assert(Tiebreak.ensure(df).collect().toSeq == df.collect().toSeq)
  }
}
