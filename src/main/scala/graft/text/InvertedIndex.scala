package graft.text

import graft.Graft.LeaseOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index construction: term → sorted posting list — the
  * backbone of corpus search, contamination probes
  * ([[TextDedup.containmentPairs]] is the join-form of the same
  * structure), and audit tooling ("which documents contain this
  * phrase?").
  *
  * Posting lists are SEGMENTED by doc-id range: the grouping key is
  * (term, doc_id div segWidth), so one term's postings split across
  * segments of at most `segWidth` candidate ids. That bounds the
  * collect_list state per group — a stopword's posting list at 100 TB
  * is billions of ids, which must never sit in ONE aggregation buffer;
  * segment-local lists parallelize the build and stream to parquet as
  * ordinary rows (readers merge segments, which arrive pre-sorted).
  *
  * Lists are emitted comma-joined: the portable-hash convention for
  * array results (the driver's pandas compare can't hash arrays), and
  * numeric-sorted so the text form is canonical.
  */
object InvertedIndex {

  /** Segmented postings over normalized words ([[TextDedup.normText]]).
    * Output: (tok, seg, df_seg, postings) — df_seg = docs in this
    * segment containing tok, postings = their sorted ids. */
  def postings(docs: DataFrame, segWidth: Long = 200L): DataFrame = {
    require(segWidth > 0, "segWidth must be positive")
    graft.Par.fanOut(docs)
      .select(col("doc_id"), TextDedup.normText(col("text")).as("norm"))
      .select(col("doc_id"), explode(expr("filter(split(norm, ' '), w -> w <> '')")).as("tok"))
      .dropDuplicates("doc_id", "tok")
      .withColumn("seg", expr(s"doc_id div ${segWidth}L"))
      .groupBy(col("tok"), col("seg"))
      .agg(count(lit(1)).as("df_seg"),
        concat_ws(",", sort_array(collect_list(col("doc_id")))).as("postings"))
  }

  /** Positional phrase search — the adjacency join over a positional
    * posting stream: a document matches when its token stream (split on
    * space, empties dropped) contains `phrase` as CONSECUTIVE tokens.
    * Output: (doc_id, n_occurrences) for matching docs, by doc_id.
    * Occurrences may overlap ("a a a" contains "a a" twice) — position
    * arithmetic counts all of them, which substring-replace counting
    * cannot.
    *
    * Scale: the exploded (doc, pos, tok) stream is filtered to the
    * phrase's terms BEFORE any join, so each adjacency join is keyed by
    * (doc_id, pos) over posting-list-sized inputs — the standard
    * phrase-query plan over a positional inverted index; at 100 TB the
    * filtered stream comes straight from the materialized index instead
    * of a re-tokenize, same joins. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame =
    phraseSearchFromIndex(tokenPositions(docs), phrase)

  /** The POSITIONAL posting table (tok, doc_id, pos) over the raw
    * whitespace tokenization — the phrase-query artifact (warehouse
    * `token_positions`, landed term-sorted like bm25_postings so a
    * phrase's term filter prunes by row-group stats; bucketed by `tok`
    * at real scale). Map-only. */
  def tokenPositions(docs: DataFrame): DataFrame =
    graft.Par.fanOut(docs)
      .select(col("doc_id"),
        posexplode(expr("filter(split(text, ' '), w -> w <> '')")).as(Seq("pos", "tok")))
      .select(col("tok"), col("doc_id"), col("pos"))

  /** [[phraseSearch]] over the materialized positional index — the
    * serving shape: the term filter prunes the posting read, each
    * adjacency join is keyed (doc_id, pos) over posting-list-sized
    * inputs, and the corpus text is never re-tokenized per query. */
  def phraseSearchFromIndex(positions: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.length >= 2, "phrase needs at least two tokens")
    val toks = positions.where(col("tok").isin(phrase.distinct: _*))
      .leased // probed once per phrase term by the adjacency joins
    val first = toks.where(col("tok") === phrase.head).select(col("doc_id"), col("pos"))
    val matches = phrase.zipWithIndex.tail.foldLeft(first) { case (acc, (w, i)) =>
      acc.join(toks.where(col("tok") === w)
        .select(col("doc_id"), (col("pos") - i).as("pos")), Seq("doc_id", "pos"))
    }
    matches.groupBy(col("doc_id")).agg(count(lit(1)).as("n_occurrences"))
      .orderBy("doc_id")
  }
}
