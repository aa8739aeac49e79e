package graft.text

import graft.SparkSpec

class CasChunkSpec extends SparkSpec {
  import spark.implicits._

  // varied text (distinct grams throughout) so hash cuts actually land;
  // a repeated phrase has only ~45 distinct grams and may draw no cuts
  private val base = (1 to 200).map(i => s"w${i * 7919 % 997}").mkString(" ")

  private def statsOf(rows: Seq[(String, String)]) =
    CasChunk.stats(rows.toDF("source", "text"), modulus = 16).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("identical payloads in one source dedup to the same blocks") {
    val one = statsOf(Seq(("s1", base)))("s1")
    val two = statsOf(Seq(("s1", base), ("s1", base)))("s1")
    assert(two._1 == 2 * one._1) // twice the chunk writes…
    assert(two._2 == one._2)     // …but not one new stored block
    assert(two._3 >= 500000L)    // ≥ half the writes are dups
  }

  test("shift resistance: a prefixed copy still shares blocks cross-source") {
    val st = statsOf(Seq(("a", base), ("b", "XYZ PREFIX " + base)))
    // content-defined cuts realign after the insertion, so the two
    // sources share most distinct blocks
    assert(st("a")._4 > 0 && st("b")._4 > 0)
    assert(st("a")._4 >= st("a")._2 / 2, s"shared=${st("a")._4} of ${st("a")._2}")
  }

  test("fixed-offset blocking would NOT share blocks under a 1-char shift") {
    // control experiment documenting why CDC: chunk the shifted copy by
    // fixed 64-char offsets and count shared digests — zero
    val fixed = Seq(("a", base), ("b", "X" + base)).toDF("source", "text")
      .selectExpr("source",
        """explode(transform(sequence(0, cast(ceil(length(text) / 64.0) as int) - 1),
          |  i -> md5(substring(text, i * 64 + 1, 64)))) AS block_md5""".stripMargin)
    val shared = fixed.groupBy("block_md5")
      .agg(org.apache.spark.sql.functions.countDistinct("source").as("nsrc"))
      .where("nsrc > 1").count()
    assert(shared == 0L)
  }

  test("short payloads (< one gram) form a single whole-text chunk") {
    val st = statsOf(Seq(("s", "tiny")))("s")
    assert(st._1 == 1L && st._2 == 1L && st._3 == 0L)
  }

  test("a payload whose rolling hash never fires still splits (max clamp)") {
    // md5("aaaaaaaa") 28-bit gram hash % 64 = 10, so "a"*1000 has ZERO
    // candidate cuts at the default modulus — pre-clamp this was one
    // unbounded 1000-char chunk. Forced cuts at 4×modulus = 256 land at
    // 256/512/768, closing at 1000: three identical 256-blocks + a
    // 232-tail.
    val ch = CasChunk.chunks(Seq(("s", "a" * 1000)).toDF("source", "text"))
      .collect().map(_.getString(1))
    assert(ch.length == 4, s"chunks=${ch.length}")
    val sizes = ch.groupBy(identity).map(_._2.length).toSeq.sorted
    assert(sizes == Seq(1, 3), s"dup profile=$sizes")
  }

  test("cut candidates closer than minLen to the last cut are skipped (min clamp)") {
    // md5("xxxxxxxx") gram hash % 64 = 0: EVERY window fires, so "x"*100
    // offers cuts at 8..100. The greedy min clamp (modulus/4 = 16)
    // accepts 16,32,48,64,80,96 and the tail closes at 100: six
    // 16-blocks + one 4-tail.
    val ch = CasChunk.chunks(Seq(("s", "x" * 100)).toDF("source", "text"))
      .collect().map(_.getString(1))
    assert(ch.length == 7, s"chunks=${ch.length}")
    val sizes = ch.groupBy(identity).map(_._2.length).toSeq.sorted
    assert(sizes == Seq(1, 6), s"dup profile=$sizes")
  }

  test("chunks cover the text: digests of re-split never lose content") {
    // two different payloads → no shared digests, all counts positive
    val st = statsOf(Seq(("a", base), ("b", base.toUpperCase)))
    assert(st("a")._1 > 1 && st("b")._1 > 1)
    assert(st("a")._4 == 0 && st("b")._4 == 0)
  }
}
