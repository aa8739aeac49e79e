package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextRankSpec extends SparkSpec {
  import spark.implicits._

  test("hub word of a star graph scores highest") {
    // "hub" co-occurs with every spoke; each spoke only with hub (and
    // its window-2/3 neighbors across doc boundaries never pair)
    val docs = Seq((1L, "hub alpha"), (2L, "hub beta"), (3L, "hub gamma"),
      (4L, "hub delta"), (5L, "hub epsilon")).toDF("doc_id", "text")
    val top = TextRank.keywords(docs).collect()
    assert(top.head.getString(0) == "hub", top.map(_.getString(0)).mkString(","))
    // damping floor: every score >= (1-d) in micros
    assert(top.forall(_.getLong(1) >= 150000L))
  }

  test("scores are partitioning-independent exact integers") {
    val docs = (1 to 40).map(i =>
      (i.toLong, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 7}"))
      .toDF("doc_id", "text")
    val a = rowsOf(TextRank.keywords(docs))
    val b = rowsOf(TextRank.keywords(docs.repartition(13)))
    assert(a == b)
  }

  test("isolated tokens (no co-occurrence edge) are absent") {
    // single-token docs produce no pairs; only the two-token doc ranks
    val docs = Seq((1L, "lonely"), (2L, "solo"), (3L, "pair mate"))
      .toDF("doc_id", "text")
    val toks = TextRank.keywords(docs).collect().map(_.getString(0)).toSet
    assert(toks == Set("pair", "mate"))
  }
}
