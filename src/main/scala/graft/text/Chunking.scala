package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for context-window preparation: split each document
  * into overlapping fixed-size token windows — the standard pre-training
  * step between curation and sequence packing (long docs must be cut to
  * the model's context budget; overlap preserves cross-boundary context).
  *
  * Windows start every `stride` tokens; the last window starts at the
  * smallest multiple of `stride` that still reaches the end of the
  * document, so no token is dropped and no fully-redundant tail window
  * is emitted. A document shorter than one window (including the empty
  * document) yields exactly one chunk.
  *
  * Scale posture (100 TB): map-only — tokenize, explode one small index
  * range per doc, slice. No shuffle, no UDFs, stays inside whole-stage
  * codegen. Output inflation is bounded by ~window/stride (1.33× at the
  * 64/48 defaults), independent of document length.
  */
object Chunking {

  /** Overlapping token windows per document. `docs` columns: doc_id,
    * text. Output: (doc_id, chunk_id, n_chunk_tokens, chunk_text),
    * one row per window. Tokens are the whitespace tokens of
    * [[TextAnalysis]] (empty strings dropped, so runs of spaces don't
    * produce ghost tokens). */
  def tokenWindows(docs: DataFrame, window: Int = 64, stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window (gaps would drop tokens)")
    graft.Par.fanOut(docs)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), w -> w != '')").as("ws"))
      // n_ws precomputed BEFORE the explode: every window-arithmetic
      // column downstream references the scalar, not `ws`, so a
      // consumer that prunes chunk_text (the pack family — q45/q115/
      // q140/q142/q148 keep only chunk counts/sizes) lets Catalyst drop
      // `ws` from the Generate entirely. Pre-r15 the explode output
      // carried the FULL token array on every chunk row just to take
      // size(ws) — ~window/stride copies of each document's array
      // materialized per doc (measured: the majority of the pack
      // family's per-query cost at sf0.1; guide §2.3 "project before
      // the exchange" applied to a Generate).
      .select(col("doc_id"), col("ws"), size(col("ws")).as("n_ws"))
      // chunk starts: 0, stride, …, first start with start + window >= len
      .select(col("doc_id"), col("ws"), col("n_ws"),
        explode(expr(
          s"sequence(0L, (greatest(n_ws - $window, 0) + ${stride - 1}) div $stride)"))
          .as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        greatest(least(col("n_ws") - col("chunk_id") * stride, lit(window)), lit(0))
          .cast("long").as("n_chunk_tokens"),
        concat_ws(" ",
          expr(s"slice(ws, cast(chunk_id * $stride + 1 as int), $window)")).as("chunk_text"))
  }
}
