package graft.text

import graft.SparkSpec

class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  // Varied texts plus a block of byte-identical docs: identical text ⇒
  // identical logit, and the tie-stable binning must keep the whole
  // block in ONE decile no matter how any engine orders ties.
  private val docs = ((1L to 16L).map { i =>
    (i, (1L to (i % 5 + 2)).map(j => s"tok${(i * 7 + j) % 11}").mkString(" "))
  } ++ (17L to 20L).map(i => (i, "same same same"))).toDF("doc_id", "text")

  test("audit equals a from-scratch Scala replay of binning and agreement") {
    val scored = HashedLinearModel.score(docs)
      .select("doc_id", "logit_milli").as[(Long, Long)].collect().toMap
    val flags = TextAnalysis.qualityFlags(docs)
      .select("doc_id", "flag_repetitive", "flag_short_words",
        "flag_long_words", "flag_symbol_heavy")
      .as[(Long, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> (r._2.max(r._3).max(r._4).max(r._5) == 0)).toMap

    val tot = scored.size.toLong
    val sortedVals = scored.values.toSeq.distinct.sorted
    val below = sortedVals.zip(
      sortedVals.scanLeft(0L)((acc, v) => acc + scored.values.count(_ == v))
        .dropRight(1)).toMap
    val decileOf = scored.map { case (id, v) =>
      id -> math.min(9L, below(v) * 10L / tot)
    }
    val expected = decileOf.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (dec, m) =>
        val ids = m.keys.toSeq
        val logits = ids.map(scored)
        val nKeep = ids.count(scored(_) >= 0L).toLong
        val nGold = ids.count(flags).toLong
        (dec, ids.size.toLong, logits.min, logits.max,
          nKeep * 1000000L / ids.size, nGold * 1000000L / ids.size)
    }

    val got = HashedLinearModel.calibrationAudit(docs)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("identical docs share one decile and bins cover disjoint value ranges") {
    val out = HashedLinearModel.calibrationAudit(docs)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._2).sum == 20L)
    // Value-disjoint, ordered bins: hi(d) < lo(d+1) strictly. This IS
    // the tie-stability proof — two equal logits split across bins
    // would make adjacent ranges share that value and trip the strict
    // inequality.
    out.sliding(2).foreach {
      case Seq(a, b) => assert(a._4 < b._3)
      case _         =>
    }
  }
}
