package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) + content-addressed block dedup — the
  * storage-side dedup primitive for multimodal/blob payloads (the
  * restic/borg/LBFS shape): cut points come from a rolling content hash,
  * so an insertion early in a payload shifts only the chunk it lands in,
  * and every identical span re-chunks to identical blocks no matter its
  * offset. Fixed-offset blocking (the naive alternative) finds ZERO
  * duplicates on shifted text — measured on this very corpus — which is
  * exactly why CAS stores chunk by content, not position.
  *
  * Reference analog: none (the reference stores rows in Postgres); this
  * extends the dedup family (SURVEY §7.6) from document- (q12) and
  * segment- (q54) granularity down to storage blocks.
  *
  * Determinism contract: the "rolling hash" is the md5-derived 28-bit
  * gram hash of the 8-char window ending at each position (the same gram
  * construction as winnowing, [[TextAnalysis.winnow]]); a cut lands
  * after position i+7 when h28 ≡ 0 (mod `modulus`), giving expected
  * chunk length ≈ modulus chars. Cut arrays, chunk extraction (zip of
  * shifted cut lists), and digests are pure per-row array expressions —
  * identical in DuckDB — so q98's stats hash-match.
  *
  * Scale posture (100 TB): chunking is MAP-ONLY (no window, no shuffle
  * carrying text — the chunk list is built per row before the explode);
  * the only shuffles are the map-side-combined groupBys on (source,
  * digest) and the digest-keyed cross-source count.
  *
  * Chunk-size clamps (restic-style, ¼×–4× of `modulus` by default): a
  * candidate cut closer than `minLen` to the previous ACCEPTED cut is
  * skipped, and a span that reaches `maxLen` without an accepted cut is
  * force-cut at exactly `maxLen` — so no chunk exceeds `maxLen` (a
  * payload whose rolling hash never fires still splits) and no
  * non-final chunk is shorter than `minLen`. The greedy left-to-right
  * scan is inherently sequential PER ROW, so it runs as an `aggregate`
  * fold over the candidate list — still a pure map-only array
  * expression, mirrored in DuckDB via `list_reduce`.
  */
object CasChunk {

  /** Per-(source, chunk) digests: (source, block_md5), one row per chunk
    * occurrence. Input needs (source, text). */
  def chunks(docs: DataFrame, modulus: Int = 64,
             minLen: Int = -1, maxLen: Int = -1): DataFrame = {
    val mn = if (minLen > 0) minLen else modulus / 4
    val mx = if (maxLen > 0) maxLen else modulus * 4
    require(mx >= mn && mn >= 1, s"need 1 <= minLen ($mn) <= maxLen ($mx)")
    docs.where(col("text").isNotNull && length(col("text")) > 0)
      // ascending candidate cut positions; the gram filter
      // self-eliminates for len < 8 (sequence(1, len) is ascending for
      // every len ≥ 1)
      .select(col("source"), col("text"),
        expr(
          s"""transform(filter(sequence(1, length(text)),
             |    i -> i + 7 <= length(text) AND
             |      md5_prefix(substring(text, i, 8), 7) % $modulus = 0),
             |  i -> CAST(i + 7 AS BIGINT))""".stripMargin).as("cand"))
      // greedy clamp fold: acc = accepted cuts so far (sentinel 0 =
      // payload start; element_at(acc, -1) = last accepted). Per
      // candidate p: first force (p - last - 1) div maxLen cuts at
      // last + j·maxLen (the spans the scan crossed without a cut),
      // then accept p iff it sits ≥ minLen past the final forced cut.
      .select(col("source"), col("text"),
        expr(
          s"""aggregate(cand, array(CAST(0 AS BIGINT)),
             |  (acc, p) -> concat(
             |    acc,
             |    CASE WHEN (p - element_at(acc, -1) - 1) div $mx >= 1
             |         THEN transform(sequence(1, (p - element_at(acc, -1) - 1) div $mx),
             |                        j -> element_at(acc, -1) + j * $mx)
             |         ELSE CAST(array() AS ARRAY<BIGINT>) END,
             |    CASE WHEN p - (element_at(acc, -1)
             |           + ((p - element_at(acc, -1) - 1) div $mx) * $mx) >= $mn
             |         THEN array(p) ELSE CAST(array() AS ARRAY<BIGINT>) END))""".stripMargin)
          .as("cuts0"))
      // tail: force-cut any remaining over-long span, then close at len
      .select(col("source"), col("text"),
        expr(
          s"""concat(cuts0,
             |  CASE WHEN (length(text) - element_at(cuts0, -1) - 1) div $mx >= 1
             |       THEN transform(
             |         sequence(1, (length(text) - element_at(cuts0, -1) - 1) div $mx),
             |         j -> element_at(cuts0, -1) + j * $mx)
             |       ELSE CAST(array() AS ARRAY<BIGINT>) END,
             |  CASE WHEN length(text) > element_at(cuts0, -1)
             |       THEN array(CAST(length(text) AS BIGINT))
             |       ELSE CAST(array() AS ARRAY<BIGINT>) END)""".stripMargin).as("cuts"))
      .select(col("source"),
        explode(expr(
          """zip_with(slice(cuts, 1, size(cuts) - 1), slice(cuts, 2, size(cuts) - 1),
            |  (a, b) -> struct(a AS s, b AS e))""".stripMargin)).as("p"),
        col("text"))
      .select(col("source"),
        md5(expr("substring(text, CAST(p.s + 1 AS INT), CAST(p.e - p.s AS INT))")).as("block_md5"))
  }

  /** Per-source CAS store stats: total chunk writes, distinct stored
    * blocks, dup rate (ppm, integer), and how many of the source's
    * distinct blocks are shared with ≥1 other source (cross-source
    * dedup potential). */
  def stats(docs: DataFrame, modulus: Int = 64): DataFrame = {
    val per = chunks(docs, modulus)
      .groupBy(col("source"), col("block_md5")).agg(count(lit(1)).as("n"))
    // r16: ONE pass over `per`. The pre-r16 shape computed bySrc and
    // crossShared as two separate consumers of the UNLEASED `per` —
    // Spark re-ran the whole md5-heavy chunk pipeline per consumer (the
    // two ~10 s-run twin stages in the q98 profile) and paid a
    // join-back. `nsrc` rides a window over the (source, block) rows —
    // partitioned by block hash, bounded per partition by the source
    // cardinality — and both aggregates fold into one groupBy(source);
    // a source with no cross-shared block counts 0 via the conditional
    // count, exactly the old left-join + na.fill.
    per
      .withColumn("nsrc", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("block_md5"))))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_chunks"), count(lit(1)).as("n_distinct"),
        count(when(col("nsrc") > 1, 1)).as("n_cross_shared"))
      .select(col("source"), col("n_chunks"), col("n_distinct"),
        expr("((n_chunks - n_distinct) * 1000000L) div n_chunks").as("dup_ppm"),
        col("n_cross_shared"))
  }
}
