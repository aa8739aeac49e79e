package graft.text

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(text: String, w: Int, s: Int): Seq[(Long, Long, String)] =
    Chunking.tokenWindows(Seq((1L, text)).toDF("doc_id", "text"), w, s)
      .collect().toSeq
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)

  test("short doc (≤ window) is one whole chunk") {
    assert(chunks("a b c", 4, 2) == Seq((0L, 3L, "a b c")))
  }

  test("exact window length stays a single chunk") {
    assert(chunks("a b c d", 4, 2) == Seq((0L, 4L, "a b c d")))
  }

  test("one extra token spawns exactly one overlapping tail window") {
    assert(chunks("a b c d e", 4, 2) ==
      Seq((0L, 4L, "a b c d"), (1L, 3L, "c d e")))
  }

  test("stride walks every start; last window reaches the end without a redundant tail") {
    // 7 tokens, w=4, s=2 → starts 0,2 cover 0..5; start 4 needed for token 6; start 6 redundant
    assert(chunks("t0 t1 t2 t3 t4 t5 t6", 4, 2) ==
      Seq((0L, 4L, "t0 t1 t2 t3"), (1L, 4L, "t2 t3 t4 t5"), (2L, 3L, "t4 t5 t6")))
  }

  test("empty and whitespace-only docs yield one empty chunk") {
    assert(chunks("", 4, 2) == Seq((0L, 0L, "")))
    assert(chunks("   ", 4, 2) == Seq((0L, 0L, "")))
  }

  test("runs of spaces do not create ghost tokens") {
    assert(chunks("a  b   c", 2, 1) == Seq((0L, 2L, "a b"), (1L, 2L, "b c")))
  }

  test("every token appears in at least one chunk (no drops) for varied lengths") {
    for (n <- Seq(0, 1, 47, 48, 49, 63, 64, 65, 100, 200)) {
      val text = (0 until n).map(i => s"w$i").mkString(" ")
      val got = Chunking.tokenWindows(Seq((1L, text)).toDF("doc_id", "text"))
        .collect().flatMap(_.getString(3).split(" ").filter(_.nonEmpty)).toSet
      assert(got == (0 until n).map(i => s"w$i").toSet, s"n=$n")
    }
  }
}
