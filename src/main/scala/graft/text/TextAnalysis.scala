package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Text-analysis operators for LLM training-data pipelines: token
  * counting (whitespace + a BPE-ish subword estimate), quality scoring,
  * n-gram language identification, and document fingerprinting.
  *
  * Everything is built-in codegen'd expressions evaluated per row — no
  * UDFs, no shuffles; at 100 TB these are pure map stages that fuse into
  * whatever scan precedes them. Ratios divide exact integers so the
  * DuckDB oracle reproduces every double bit-for-bit.
  */
object TextAnalysis {

  /** Stopword lists for the language-ID heuristic (tiny on purpose:
    * deterministic, portable, and explainable — a real deployment would
    * swap in per-language frequency tables, same plan shape). */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "de", "y"),
    "fr" -> Seq("le", "la", "de", "et"))

  private def words(c: String): String = s"filter(split($c, ' '), w -> w <> '')"

  /** Token + character statistics and a composite quality score.
    * docs columns: doc_id, text. Output per doc:
    * n_chars, n_tokens, n_subwords (BPE-ish ⌈len/4⌉ per token),
    * alpha_ratio, stopword_ratio, quality_score ∈ [0,1]. */
  def stats(docs: DataFrame): DataFrame = {
    val en = Stopwords("en").map(w => s"'$w'").mkString("(", ",", ")")
    graft.Par.fanOut(docs).select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      expr(s"size(${words("text")})").cast("long").as("n_tokens"),
      expr(s"""aggregate(${words("text")},
              | 0L, (a, t) -> a + CAST(floor((length(t) + 3) / 4) AS BIGINT))""".stripMargin)
        .as("n_subwords"),
      // BPE-ish pre-tokenization: letter runs, digit runs, single
      // punctuation — the same simple class regex evaluates identically
      // under Java regex and RE2
      size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
        .cast("long").as("n_pieces"),
      // 0-length / 0-token docs have undefined ratios → NULL (null
      // quality then fails any curation floor), never a 0/0 crash
      when(length(col("text")) > 0,
        length(regexp_replace(lower(col("text")), "[^a-z ]", "")).cast("double") /
          length(col("text")).cast("double")).as("alpha_ratio"),
      expr(s"""CAST(size(filter(${words("text")}, w -> w IN $en)) AS DOUBLE)
              | / nullif(CAST(size(${words("text")}) AS DOUBLE), CAST(0.0 AS DOUBLE))"""
        .stripMargin).as("stopword_ratio"))
      .withColumn("quality_score",
        (col("alpha_ratio") * lit(0.5)) + (col("stopword_ratio") * lit(0.3)) +
          (least(col("n_tokens").cast("double") / lit(100.0), lit(1.0)) * lit(0.2)))
  }

  /** N-gram/stopword language guess: count hits per language list, pick
    * the max with a fixed tie order (en > de > es > fr). CJK scripts
    * would need char-class counting instead of word splits — out of
    * scope for the space-separated corpus, documented limitation. */
  private def stopwordHits(lang: String): Column = {
    val set = Stopwords(lang).map(w => s"'$w'").mkString("(", ",", ")")
    expr(s"size(filter(${words("text")}, w -> w IN $set))").cast("long")
  }

  /** Stopword majority vote over the *_hits columns (fixed tie order
    * en > de > es > fr). */
  private val StopwordVote: Column =
    when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("es_hits") &&
         col("en_hits") >= col("fr_hits"), "en")
      .when(col("de_hits") >= col("es_hits") && col("de_hits") >= col("fr_hits"), "de")
      .when(col("es_hits") >= col("fr_hits"), "es")
      .otherwise("fr")

  def langGuess(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      stopwordHits("en").as("en_hits"), stopwordHits("de").as("de_hits"),
      stopwordHits("es").as("es_hits"), stopwordHits("fr").as("fr_hits"))
      .withColumn("lang_guess", StopwordVote)

  /** Script-aware language ID: counts CJK characters by Unicode script
    * (Han / Hiragana+Katakana / Hangul) and, when a strict majority of
    * the text is CJK, classifies by script mix (Korean ⇐ Hangul
    * dominant; Japanese ⇐ any kana beats Han presence; else Chinese —
    * kana is the discriminator because Japanese prose mixes kana into
    * Han text while Chinese never does). Otherwise falls back to the
    * stopword vote of [[langGuess]]. All decisions are integer
    * comparisons over char counts, so the DuckDB oracle reproduces them
    * exactly (Java `\p{IsHan}` ≡ RE2 `\p{Han}` on the BMP scripts used).
    *
    * Closes the round-2 documented limitation ("CJK scripts would need
    * char-class counting instead of word splits"). Pure map stage like
    * every sketch here. */
  def langGuessCjk(docs: DataFrame): DataFrame = {
    // regexp_count, not size(regexp_extract_all(...)): counting must not
    // materialize an array of every matched char per row in a pure-map
    // stage (the DuckDB twin keeps len(regexp_extract_all) — only the
    // COUNTS are compared, so the implementations may differ).
    def scriptChars(pattern: String): Column =
      regexp_count(col("text"), lit(pattern)).cast("long")
    docs.select(
      col("doc_id"),
      stopwordHits("en").as("en_hits"), stopwordHits("de").as("de_hits"),
      stopwordHits("es").as("es_hits"), stopwordHits("fr").as("fr_hits"),
      scriptChars("\\p{IsHan}").as("han_chars"),
      (scriptChars("\\p{IsHiragana}") + scriptChars("\\p{IsKatakana}")).as("kana_chars"),
      scriptChars("\\p{IsHangul}").as("hangul_chars"),
      length(col("text")).cast("long").as("n_chars"))
      .withColumn("lang_stopword", StopwordVote)
      .withColumn("lang_final",
        when((col("han_chars") + col("kana_chars") + col("hangul_chars")) * 2 > col("n_chars"),
          when(col("hangul_chars") >= col("han_chars") &&
               col("hangul_chars") >= col("kana_chars"), "ko")
            .when(col("kana_chars") > 0, "ja")
            .otherwise("zh"))
        .otherwise(col("lang_stopword")))
      .select(col("doc_id"), col("han_chars"), col("kana_chars"), col("hangul_chars"),
        col("lang_stopword"), col("lang_final"))
  }

  /** Full winnowing fingerprints (Schleimer et al.'s local algorithm):
    * hash every char k-gram, slide a w-hash window, keep each window's
    * minimum — the distinct minima are the document's fingerprint set
    * (robust to local edits, the standard plagiarism/near-dup sketch).
    *
    * One codegen'd map call per row ([[graft.functions.WinnowFps]],
    * O(len) monotonic-deque minima) — no explode, no windows, no
    * shuffle; fuses into the scan at any scale. (History: round 2
    * exploded gram rows through two window passes — correct, but paid a
    * doc_id shuffle and per-gram row overhead; and a windows-outer array
    * expression before that hit the lambda-inlining trap.) Docs without
    * a full window (shorter than k+w−1 chars) are dropped, matching the
    * oracle's `pos <= n - w` filter.
    *
    * Fingerprints are emitted as a comma-joined STRING, not
    * array<bigint>: the driver's pandas compare sorts on every column
    * and numpy arrays are unhashable (round-2 q27 failure). DuckDB
    * twin: array_to_string(list_sort(...), ','). */
  def winnow(docs: DataFrame, k: Int = 8, w: Int = 8): DataFrame =
    graft.Par.fanOut(docs)
      .select(col("doc_id"), expr(s"winnow_fps(text, $k, $w)").as("fps"))
      .where(size(col("fps")) > 0)
      .select(
        col("doc_id"),
        concat_ws(",", col("fps").cast("array<string>")).as("fingerprints"),
        size(col("fps")).cast("long").as("n_fps"))

  /** Gopher-style per-document quality flags (Rae et al., "Scaling
    * Language Models: ... Gopher", arXiv:2112.11446 §A1.1 — the
    * repetition / word-length / symbol heuristics every curation
    * pipeline reimplements), as INTEGER comparisons so the DuckDB
    * oracle reproduces each flag exactly (no float ratios):
    *  - flag_repetitive: most frequent normalized word ≥ 1/5 of tokens
    *  - flag_short_words: mean word length < 3 (sum_len < 3·n)
    *  - flag_long_words: mean word length > 10 (sum_len > 10·n)
    *  - flag_symbol_heavy: non-[a-zA-Z0-9 ] chars ≥ 1/10 of chars
    * Docs with no tokens raise short_words (degenerate), not the rest.
    *
    * Scale: one (doc, term) count aggregate feeds the repetition flag
    * (map-side combine); everything else is per-row arithmetic. */
  def qualityFlags(docs: DataFrame): DataFrame = {
    val toks = graft.Par.fanOut(docs)
      .select(col("doc_id"), TextDedup.normText(col("text")).as("norm"))
      .select(col("doc_id"), explode(expr(words("norm"))).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val rep = tf.groupBy(col("doc_id"))
      .agg(max(col("tf")).as("max_tf"), sum(col("tf")).as("n_toks"),
        sum(length(col("tok")) * col("tf")).as("sum_len"))
    docs.select(col("doc_id"), length(coalesce(col("text"), lit(""))).cast("long").as("n_chars"),
        (length(coalesce(col("text"), lit(""))) -
          length(regexp_replace(coalesce(col("text"), lit("")), "[a-zA-Z0-9 ]", "")))
          .cast("long").as("n_plain"))
      .join(rep, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("max_tf"), lit(0L)) * 5 >= coalesce(col("n_toks"), lit(0L)) &&
          coalesce(col("n_toks"), lit(0L)) > 0).cast("int").as("flag_repetitive"),
        (coalesce(col("sum_len"), lit(0L)) < coalesce(col("n_toks"), lit(0L)) * 3 ||
          coalesce(col("n_toks"), lit(0L)) === 0).cast("int").as("flag_short_words"),
        (coalesce(col("sum_len"), lit(0L)) > coalesce(col("n_toks"), lit(0L)) * 10)
          .cast("int").as("flag_long_words"),
        ((col("n_chars") - col("n_plain")) * 10 >= col("n_chars") && col("n_chars") > 0)
          .cast("int").as("flag_symbol_heavy"))
  }

  /** Within-document repetition scrub (Rae et al. §A1.1's repetition
    * REMOVAL, where [[graft.SparkEntry]] q100 only measures): drop
    * repeated sentences keeping the FIRST occurrence, order preserved
    * (index-aware filter: keep s at position i iff its first
    * occurrence IS i). Map-only; emits the scrubbed text's md5 so a
    * gate can pin the reconstruction byte-for-byte without shipping
    * it. Output: (doc_id, n_sents, n_removed, scrub_md5). */
  def scrubRepeatedSentences(docs: DataFrame): DataFrame =
    graft.Par.fanOut(docs).where(col("text").isNotNull)
      .withColumn("sents", expr(
        "filter(transform(split(text, '\\\\. '), x -> trim(x)), x -> x <> '')"))
      .withColumn("uniq", expr(
        "filter(sents, (x, i) -> array_position(sents, x) = i + 1)"))
      .select(col("doc_id"),
        size(col("sents")).as("n_sents"),
        (size(col("sents")) - size(col("uniq"))).as("n_removed"),
        md5(concat_ws(". ", col("uniq"))).as("scrub_md5"))

  /** Code-switching / mixed-language detection: the q21 stopword vote
    * taken PER SENTENCE (q121's split convention) and compared against
    * the whole-document vote — the fraction of sentences that disagree
    * is the mixed-language signal a monolingual filter needs before
    * trusting a doc-level language id (a half-English half-German page
    * votes 'en' overall and then poisons the German-only training
    * slice). Map + explode + one grouped aggregate; every vote is an
    * integer stopword-count comparison with the fixed tie order, so
    * the oracle replays it exactly. Docs with no sentences drop (an
    * empty doc has no language evidence at either granularity). */
  def codeSwitch(docs: DataFrame): DataFrame = {
    def hitsOn(cn: String, lang: String): Column = {
      val set = Stopwords(lang).map(w => s"'$w'").mkString("(", ",", ")")
      expr(s"size(filter(filter(split($cn, ' '), w -> w <> ''), w -> w IN $set))")
        .cast("long")
    }
    def vote(p: String): Column =
      when(col(s"${p}en") >= col(s"${p}de") && col(s"${p}en") >= col(s"${p}es") &&
           col(s"${p}en") >= col(s"${p}fr"), "en")
        .when(col(s"${p}de") >= col(s"${p}es") && col(s"${p}de") >= col(s"${p}fr"), "de")
        .when(col(s"${p}es") >= col(s"${p}fr"), "es")
        .otherwise("fr")
    val sent = graft.Par.fanOut(docs).where(col("text").isNotNull)
      .withColumn("den", hitsOn("text", "en")).withColumn("dde", hitsOn("text", "de"))
      .withColumn("des", hitsOn("text", "es")).withColumn("dfr", hitsOn("text", "fr"))
      .withColumn("doc_lang", vote("d"))
      .withColumn("sents", expr(
        "filter(transform(split(text, '\\\\. '), x -> trim(x)), x -> x <> '')"))
      .select(col("doc_id"), col("doc_lang"), explode(col("sents")).as("sent"))
      .withColumn("sen", hitsOn("sent", "en")).withColumn("sde", hitsOn("sent", "de"))
      .withColumn("ses", hitsOn("sent", "es")).withColumn("sfr", hitsOn("sent", "fr"))
      .withColumn("sent_lang", vote("s"))
    sent.groupBy(col("doc_id"), col("doc_lang"))
      .agg(count(lit(1)).as("n_sents"),
        sum((col("sent_lang") =!= col("doc_lang")).cast("long")).as("n_switched"))
      .select(col("doc_id"), col("doc_lang"), col("n_sents"), col("n_switched"),
        expr("(n_switched * 1000000) div n_sents").as("mixed_ppm"))
      .orderBy("doc_id")
  }

  /** Composite integer document quality — the keeper-policy score
    * (q113/q115): (4 − Gopher flags raised) · 2^20 + min(n_chars,
    * 2^20 − 1). Flags dominate, then longer text wins (near-dup
    * members usually share flags, and keeping the longest is the
    * standard curation tie-break). One [[qualityFlags]] pass + a
    * per-row length — corpus state, materialized once per corpus by
    * the warehouse. */
  def compositeQuality(docs: DataFrame): DataFrame =
    qualityFlags(docs)
      .join(docs.select(col("doc_id"),
        length(coalesce(col("text"), lit(""))).cast("long").as("len")), Seq("doc_id"))
      .select(col("doc_id"),
        ((lit(4L) - col("flag_repetitive") - col("flag_short_words")
          - col("flag_long_words") - col("flag_symbol_heavy")) * lit(1048576L)
          + least(col("len"), lit(1048575L))).as("quality"))

  /** Top-k salient terms per document — keyword extraction by an
    * integer TF-IDF surrogate: salience = (tf × corpus_size) div df,
    * ranked (salience DESC, tf DESC, term ASC). The linear-idf integer
    * form keeps the score float-free, so the DuckDB oracle reproduces
    * every rank bit-for-bit (log-idf would hinge on libm ulps); it
    * orders identically to tf/df, which is what separates salient terms
    * from stopwords ("the" scores tf×N/N = tf; a rare term scores
    * ~tf×N/2).
    *
    * Terms are the normalized words of [[TextDedup.normText]]. Scale:
    * two shuffles (doc-term tf agg, term df agg) + a term-keyed join +
    * one window whose rank-≤-k filter Spark 4 rewrites to
    * WindowGroupLimit (map-side top-k before the exchange). `nDocs` is
    * passed in (one metadata count) so the plan stays a pure dataflow. */
  def keywords(docs: DataFrame, nDocs: Long, k: Int = 3): DataFrame = {
    require(k > 0 && nDocs >= 0)
    val toks = graft.Par.fanOut(docs)
      .select(col("doc_id"), TextDedup.normText(col("text")).as("norm"))
      .select(col("doc_id"), explode(expr(words("norm"))).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("salience").desc, col("tf").desc, col("tok"))
    tf.join(dfreq, Seq("tok"))
      .withColumn("salience", expr(s"(tf * ${nDocs}L) div df"))
      .withColumn("kw_rank", row_number().over(w).cast("long"))
      .where(col("kw_rank") <= k)
      .select(col("doc_id"), col("kw_rank"), col("tok"), col("tf"), col("df"), col("salience"))
  }

  /** BM25 document ranking for a fixed query-term set — the retrieval
    * scorer on top of the inverted-index shape (Robertson/Spärck Jones
    * probabilistic relevance; k1 = 1.2, b = 0.75). All arithmetic is
    * integer-exact (the q53/q65 integer-micros pattern) so the DuckDB
    * oracle reproduces every score bit-for-bit — no libm `ln`, no
    * order-dependent double sums. With integer tf, len, df, N and
    * S = Σ len, each BM25 term factor is a ratio of integers:
    *   idf            = (N − df + ½)/(df + ½)          = (2(N−df)+1)/(2df+1)
    *   tf·(k1+1)/(tf + k1(1−b+b·len·N/S))              = 22·tf·S/(10·tf·S + 3·S + 9·len·N)
    * and each is materialized in fixed-point micros via one exact
    * BIGINT `div`; a doc's score is the Σ over matched terms of
    * idf_micro × tfnorm_micro (units 10⁻¹², hence `bm25_e12`).
    *
    * N and S count docs with ≥ 1 token (the indexed corpus). Output:
    * top-`k` docs by (bm25_e12 DESC, doc_id) with the matched-term
    * count — a bounded TakeOrderedAndProject, never a global sort.
    *
    * Scale: the term filter prunes the exploded token stream before the
    * (doc, term) aggregate, so the shuffled tf table carries only
    * query-term hits; df comes from that same small table; N and S are
    * one scalar aggregate crossJoined as a 1-row broadcast. At web
    * scale (N ≳ 2⁶³/10⁶ per-term products) the idf factor moves to
    * DECIMAL on the tiny per-term df table — the dataflow is unchanged. */
  def bm25(docs: DataFrame, terms: Seq[String], k: Int = 20): DataFrame =
    bm25FromIndex(bm25Postings(docs), bm25DocLens(docs), terms, k)

  /** [[bm25]] over the MATERIALIZED index — the serving shape: `postings`
    * = [[bm25Postings]], `doclens` = [[bm25DocLens]], both warehouse
    * parquet at scale, so a query's cost is a term-pruned postings read
    * plus a doc-keyed join — the corpus text is never re-tokenized per
    * query (the knn-truth / gram-table discipline applied to sparse
    * retrieval). */
  def bm25FromIndex(postings: DataFrame, doclens: DataFrame,
                    terms: Seq[String], k: Int = 20): DataFrame = {
    require(terms.nonEmpty && k > 0)
    bm25TermScoresFromIndex(postings, doclens, terms)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"),
        sum(col("idf_micro") * col("tfnorm_micro")).as("bm25_e12"))
      .orderBy(col("bm25_e12").desc, col("doc_id")).limit(k)
  }

  /** The full inverted index (tok, doc_id, tf) under the shared
    * whitespace tokenization — THE sparse-retrieval corpus artifact
    * (every BM25 query reads this instead of re-tokenizing the corpus;
    * at 100 TB it is bucketed by `tok` so a term filter touches only
    * its buckets — here it lands term-sorted so parquet row-group
    * stats prune the same way). */
  def bm25Postings(docs: DataFrame): DataFrame =
    graft.Par.fanOut(docs)
      .select(col("doc_id"), explode(expr(words("text"))).as("tok"))
      .groupBy(col("tok"), col("doc_id")).agg(count(lit(1)).as("tf"))

  /** Per-document token counts (doc_id, len), docs with ≥ 1 token —
    * the BM25 length-normalization artifact beside [[bm25Postings]]
    * (derivable from it as Σ tf; materialized separately so the
    * per-doc join never re-aggregates the postings). */
  def bm25DocLens(docs: DataFrame): DataFrame =
    graft.Par.fanOut(docs)
      .select(col("doc_id"), explode(expr(words("text"))).as("tok"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("len"))

  /** Per-(doc, query-term) BM25 partial scores over the index tables —
    * the shared scoring stage behind [[bm25FromIndex]] (per-doc sum +
    * global top-k) and [[bm25TopkPerTermFromIndex]] (per-term ranked
    * lists). df comes from the term-pruned postings slice itself; N
    * and S are one scalar aggregate over `doclens` crossJoined as a
    * 1-row broadcast. */
  private def bm25TermScoresFromIndex(postings: DataFrame, doclens: DataFrame,
                                      terms: Seq[String]): DataFrame = {
    val tf = postings.where(col("tok").isin(terms: _*))
      .select(col("doc_id"), col("tok"), col("tf"))
    val totals = doclens.agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), Seq("tok")).join(doclens, Seq("doc_id"))
      .crossJoin(broadcast(totals))
      .withColumn("idf_micro",
        expr("(1000000L * (2 * (n_docs - df) + 1)) div (2 * df + 1)"))
      .withColumn("tfnorm_micro",
        expr("(1000000L * 22 * tf * sum_len) div " +
          "(10 * tf * sum_len + 3 * sum_len + 9 * len * n_docs)"))
  }

  /** Ranked posting lists: top-`k` docs PER QUERY TERM by the term's
    * BM25 partial score — the inverted-index serving shape (keyword
    * search returns a ranked list per term before any fusion), the
    * sparse twin of the dense ann_*_topk lists. Selection is the
    * bounded `top_k_pairs` aggregate — k rows of state per term with
    * map-side partials, never a per-term sort window over the posting
    * stream. Output: (term, rank, doc_id, bm25_e9).
    *
    * Score scale: the exact partial is idf_micro × tfnorm_micro (e12,
    * bounded by ~1.5e12·n_docs for a df=1 term) — ABOVE 2^53 once
    * n_docs ≳ 6e3, where the DOUBLE state of `top_k_pairs` would
    * silently lose rank precision. The ranked score is therefore the
    * e9 truncation (both engines integer-divide BEFORE any double
    * cast), exact up to n_docs ≈ 6e6; past that, rescale again or move
    * the per-term partials to DECIMAL — the dataflow is unchanged. */
  def bm25TopkPerTerm(docs: DataFrame, terms: Seq[String], k: Int = 10): DataFrame =
    bm25TopkPerTermFromIndex(bm25Postings(docs), bm25DocLens(docs), terms, k)

  /** [[bm25TopkPerTerm]] over the materialized index tables (see
    * [[bm25FromIndex]] for the artifact discipline). */
  def bm25TopkPerTermFromIndex(postings: DataFrame, doclens: DataFrame,
                               terms: Seq[String], k: Int = 10): DataFrame = {
    require(terms.nonEmpty && k > 0)
    bm25TermScoresFromIndex(postings, doclens, terms)
      .withColumn("s_e9", expr("(idf_micro * tfnorm_micro) div 1000"))
      .groupBy(col("tok"))
      .agg(expr(s"top_k_pairs(doc_id, CAST(s_e9 AS DOUBLE), $k)").as("tk"))
      .select(col("tok").as("term"), posexplode(col("tk")).as(Seq("r0", "p")))
      .select(col("term"), (col("r0") + 1).cast("long").as("rank"),
        col("p.id").as("doc_id"),
        expr("CAST(p.score AS BIGINT)").as("bm25_e9"))
      .orderBy("term", "rank")
  }

  /** Rolling-hash document fingerprint: min 28-bit hash over all char
    * 8-grams (winnowing's global-window degenerate case — one value per
    * doc; [[winnow]] is the full per-window version). */
  def fingerprint(docs: DataFrame): DataFrame =
    graft.Par.fanOut(docs).select(
      col("doc_id"),
      expr("""CASE WHEN length(text) >= 8 THEN
             |  array_min(transform(sequence(1, length(text) - 7),
             |    i -> md5_prefix(substring(text, i, 8), 7)))
             |  ELSE md5_prefix(text, 7) END"""
        .stripMargin).as("fingerprint"))
}
