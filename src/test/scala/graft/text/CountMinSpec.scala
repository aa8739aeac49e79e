package graft.text

import graft.SparkSpec

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "cat cat cat")).toDF("doc_id", "text")

  test("estimates are one-sided: cm_estimate >= true_cnt for every token") {
    val rows = CountMin.frequencyAudit(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1), r.toString))
  }

  test("wide sketch with few tokens is exact (no collisions at width 1024)") {
    val got = CountMin.frequencyAudit(docs)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("the") == ((3L, 3L)))
    assert(got("cat") == ((4L, 4L)))
    assert(got("sat") == ((2L, 2L)))
  }

  test("width-1 sketch collapses every token into one counter per row") {
    val total = 6 + 3 + 3 // all token occurrences
    val rows = CountMin.frequencyAudit(docs, depth = 2, width = 1)
      .collect()
    rows.foreach(r => assert(r.getLong(2) == total.toLong, r.toString))
  }

  test("sketch table is bounded by depth x width cells") {
    val toks = docs.selectExpr("explode(filter(split(text, ' '), w -> w != '')) AS tok")
    assert(CountMin.sketch(toks, depth = 3, width = 8).count() <= 24)
  }

  test("ranking is (true_cnt desc, tok) and respects topK") {
    val top = CountMin.frequencyAudit(docs, topK = 2).collect()
    assert(top.length == 2)
    assert(top(0).getString(0) == "cat" && top(1).getString(0) == "the")
  }
}
