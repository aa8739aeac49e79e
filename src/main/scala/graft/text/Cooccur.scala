package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The word co-occurrence graph shared by PMI collocations (q93) and
  * TextRank keywords (q101) — corpus state by the same argument as the
  * near-dup pair table: vocabulary-bounded, derived once per corpus,
  * read by every graph analytic.
  *
  * Pair generation is MAP-ONLY: each document's token array emits its
  * own (position, offset ≤ window) pairs via nested `transform` — one
  * projection, zero joins — then ONE map-side-combined groupBy counts
  * edges. The r7 version exploded the corpus token stream ×window and
  * hash-joined it back to itself on (doc_id, pos): two corpus-token-
  * sized shuffles where none are needed (shuffle volume ∝ tokens ×
  * window — the scale killer the r7 verdict flagged at 16.5 s; the
  * window pairing is position-local within a document, so no exchange
  * can ever be required).
  */
object Cooccur {

  /** The per-document pair array over a token-array column `ws`:
    * canonicalized (tok_a, tok_b) structs for tokens at distance
    * 1..`window`. Pure projection — shared by the batch counter and
    * the streaming twin so both emit identical pairs per document. */
  private[graft] def pairsExpr(window: Int): org.apache.spark.sql.Column = {
    require(window >= 1)
    expr(
      s"""flatten(transform(ws, (ta, i) ->
         |  transform(slice(ws, i + 2, $window), tb ->
         |    named_struct('tok_a', least(ta, tb), 'tok_b', greatest(ta, tb)))))"""
        .stripMargin)
  }

  /** Undirected co-occurrence pair counts (tok_a, tok_b, w): tokens at
    * distance 1..`window` within a document, canonicalized so
    * tok_a <= tok_b. Self-pairs (same token twice inside the window)
    * are KEPT — q93's PMI counts them; TextRank drops them as
    * self-loops ([[TextRank.keywordsFromPairs]]). */
  def pairCounts(docs: DataFrame, window: Int = 3): DataFrame =
    graft.Par.fanOut(docs)
      .withColumn("ws", expr("filter(split(text, ' '), w -> w <> '')"))
      .select(explode(pairsExpr(window)).as("p"))
      .select(col("p.tok_a").as("tok_a"), col("p.tok_b").as("tok_b"))
      .groupBy(col("tok_a"), col("tok_b")).agg(count(lit(1)).as("w"))

  /** Unigram counts (tok, n) over the same tokenization — the PMI
    * denominator; vocabulary-sized after one map-side-combined count.
    * The corpus total token count is `sum(n)` over this table. */
  def unigramCounts(docs: DataFrame): DataFrame =
    graft.Par.fanOut(docs)
      .select(explode(expr("filter(split(text, ' '), w -> w <> '')")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
}
