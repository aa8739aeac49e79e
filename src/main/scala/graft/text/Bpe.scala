package graft.text

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich et al., ACL 2016) — the
  * tokenizer-training stage of an LLM data pipeline: iteratively merge
  * the most frequent adjacent symbol pair (weighted by word frequency)
  * until `nMerges` rules exist; encoding applies the rules in rank
  * order. Deterministic: ties break on the lexicographically smallest
  * (left, right) pair, so the merge table is reproducible run to run.
  *
  * Representation: a word's symbol sequence is a single string
  * " s1 s2 … sn " (space-separated, space-padded). One merge step is
  * then a regex replace — `" a b(?= )" → " ab"` — whose left-to-right
  * non-overlapping semantics are EXACTLY BPE's greedy merge scan (the
  * lookahead keeps the trailing separator so [a,b,a,b] merges both
  * pairs in one pass). Symbols never contain spaces, so boundaries
  * cannot be crossed; pattern text is Pattern.quote'd so no corpus
  * character is ever a metacharacter.
  *
  * Scale posture (100 TB): training state is the DISTINCT-WORD table
  * (vocabulary-bounded, not corpus-bounded) with frequencies — built by
  * one map-side-combinable count. Each iteration is one pair-count
  * aggregate over that table (shuffle keyed on pairs) plus a map-only
  * rewrite; the argmax collects ONE row. N merges = N bounded jobs —
  * the standard distributed BPE loop. Encoding is embarrassingly
  * parallel (N regex passes fused into one projection).
  */
object Bpe {

  /** One trained rule. */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  private def mergeExpr(c: org.apache.spark.sql.Column, m: Merge) =
    regexp_replace(c,
      lit(Pattern.quote(s" ${m.left} ${m.right}") + "(?= )"),
      lit(Matcher.quoteReplacement(s" ${m.left}${m.right}")))

  /** Distinct words of `docs.text` with frequencies, symbols = single
    * characters, in the padded-string representation. */
  def wordTable(docs: DataFrame): DataFrame =
    graft.Par.fanOut(docs)
      .select(explode(expr("filter(split(text, ' '), w -> w != '')")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 ")).as("syms"),
        col("freq"))

  /** Train up to `nMerges` rules over `docs` (doc_id, text). Stops
    * early when no adjacent pair remains.
    *
    * One persisted baseline (the distinct-word table) and ONE job per
    * iteration: generation g's symbol state is the baseline with the
    * first g rules re-applied lazily in the projection (g ≤ nMerges
    * cheap map-side regex passes — re-deriving beats materializing a
    * new generation per rule, which measured 2 jobs + a persist per
    * iteration). */
  def train(docs: DataFrame, nMerges: Int): Seq[Merge] = {
    require(nMerges > 0, "need at least one merge")
    val words = wordTable(docs).persist()
    val merges = Seq.newBuilder[Merge]
    var applied = List.empty[Merge] // newest first
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val syms = applied.reverse.foldLeft(col("syms"))((c, m) => mergeExpr(c, m))
      val best = words
        .select(col("freq"), syms.as("cursyms"))
        .select(col("freq"), expr("filter(split(trim(cursyms), ' '), s -> s != '')").as("ss"))
        .where(size(col("ss")) >= 2)
        .select(col("freq"), explode(expr(
          """zip_with(slice(ss, 1, size(ss) - 1), slice(ss, 2, size(ss) - 1),
            |         (x, y) -> struct(x AS l, y AS r))""".stripMargin)).as("p"))
        .groupBy(col("p.l"), col("p.r")).agg(sum(col("freq")).as("pf"))
        .orderBy(col("pf").desc, col("l"), col("r")).limit(1)
        .collect()
      best.headOption match {
        case None => done = true
        case Some(Row(l: String, r: String, pf: Long)) =>
          val m = Merge(rank, l, r, pf)
          merges += m
          applied = m :: applied
          rank += 1
        case Some(other) => sys.error(s"unexpected argmax row: $other")
      }
    }
    words.unpersist()
    merges.result()
  }

  /** The merge table as a DataFrame: (rank, left, right, pair_freq). */
  def mergeTable(docs: DataFrame, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, nMerges).map(m => (m.rank, m.left, m.right, m.freq))
      .toDF("rank", "left", "right", "pair_freq")
      .orderBy("rank")
  }

  /** Encode: tokenize each doc and apply the trained rules in rank
    * order (one fused projection of N regex passes). Output:
    * (doc_id, n_words, n_pieces). */
  def encode(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val words = graft.Par.fanOut(docs)
      .select(col("doc_id"), explode(expr("filter(split(text, ' '), w -> w != '')")).as("word"))
      .withColumn("syms", concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 ")))
    val encoded = merges.foldLeft(words) { (df, m) =>
      df.withColumn("syms", mergeExpr(col("syms"), m))
    }
    encoded
      .withColumn("n_pieces", size(expr("filter(split(trim(syms), ' '), s -> s != '')")).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_pieces"))
  }
}
