package graft.text

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // corpus: "ab"×3, "abc"×2, "bcd"×1 — merge sequence computed by hand
  private val docs = Seq(
    (1L, "ab ab abc"),
    (2L, "ab abc bcd")).toDF("doc_id", "text")

  test("golden merge sequence: frequency order with lexicographic tie-break") {
    val got = Bpe.train(docs, 10).map(m => (m.rank, m.left, m.right, m.freq))
    assert(got == Seq(
      (1, "a", "b", 5L),  // (a,b): 3+2 beats (b,c): 3
      (2, "ab", "c", 2L), // after merge 1
      (3, "b", "c", 1L),  // tie with (c,d) → lexicographically smaller
      (4, "bc", "d", 1L)))
  }

  test("training stops early when no adjacent pairs remain") {
    val single = Seq((1L, "x y x")).toDF("doc_id", "text")
    // words are single chars → one pairless generation after 0 merges
    assert(Bpe.train(single, 5).isEmpty)
  }

  test("greedy left-to-right scan: [a,a,a] merges once, [a,b,a,b] merges twice") {
    val aaa = Seq((1L, "aaa abab")).toDF("doc_id", "text")
    // pairs: (a,a)=2 (both positions in aaa), (a,b)=2, (b,a)=1 —
    // the (a,a)/(a,b) tie breaks lexicographically to (a,a)
    val m1 = Bpe.train(aaa, 1)
    assert(m1.map(m => (m.left, m.right, m.freq)) == Seq(("a", "a", 2L)))
    val enc1 = Bpe.encode(aaa, m1).collect().head
    assert(enc1.getLong(1) == 2L) // n_words
    assert(enc1.getLong(2) == 2L + 4L) // aaa→[aa,a] greedy-once; abab untouched
    // train (a,b) directly and check both pairs of abab merge in one pass
    val enc2 = Bpe.encode(aaa, Seq(Bpe.Merge(1, "a", "b", 2L))).collect().head
    assert(enc2.getLong(2) == 3L + 2L) // aaa→[a,a,a]; abab→[ab,ab]
  }

  test("encode applies merges in rank order and counts pieces") {
    val merges = Bpe.train(docs, 2) // (a,b) then (ab,c)
    val got = Bpe.encode(docs, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1: ab→[ab](1), ab→1, abc→[abc](1) → 3 words, 3 pieces
    assert(got(1L) == ((3L, 3L)))
    // doc 2: ab→1, abc→1, bcd→[b,c,d]→3 → 3 words, 5 pieces
    assert(got(2L) == ((3L, 5L)))
  }

  test("training is deterministic run to run") {
    assert(Bpe.train(docs, 4) == Bpe.train(docs, 4))
  }

  test("checkpoint interval never changes the merge sequence (golden corpus)") {
    val want = Bpe.train(docs, 10, checkpointEvery = 1000) // never checkpoints
    for (ce <- Seq(1, 2, 3))
      assert(Bpe.train(docs, 10, checkpointEvery = ce) == want, s"checkpointEvery=$ce")
  }

  test("50+ merge run: checkpointed training equals the lazy-reapply path") {
    // a corpus rich enough to sustain >=50 merges: varied multi-char
    // words with shared prefixes/suffixes so pair frequencies stay >0
    val rnd = new scala.util.Random(7)
    val vocab = Seq("station", "national", "rationale", "internationally",
      "operation", "generation", "preparation", "information", "transformation",
      "configuration", "documentation", "representation", "characterization")
    val corpus = (1L to 40L).map(i =>
      (i, Seq.fill(12)(vocab(rnd.nextInt(vocab.length))).mkString(" ")))
      .toDF("doc_id", "text")
    val lazyPath = Bpe.train(corpus, 55, checkpointEvery = 1000)
    val checkpointed = Bpe.train(corpus, 55, checkpointEvery = 8)
    assert(lazyPath.length >= 50, s"corpus too thin: ${lazyPath.length} merges")
    assert(checkpointed == lazyPath)
  }
}
