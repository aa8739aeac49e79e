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
  * digest) and the digest-keyed cross-source count. Real deployments add
  * min/max chunk-size clamps; the hash-cut core is the same.
  */
object CasChunk {

  /** Per-(source, chunk) digests: (source, block_md5), one row per chunk
    * occurrence. Input needs (source, text). */
  def chunks(docs: DataFrame, modulus: Int = 64): DataFrame =
    docs.where(col("text").isNotNull && length(col("text")) > 0)
      .select(col("source"),
        // ascending cut positions; the gram filter self-eliminates for
        // len < 8 (sequence(1, len) is ascending for every len ≥ 1)
        expr(
          s"""array_sort(array_union(
             |  transform(filter(sequence(1, length(text)),
             |    i -> i + 7 <= length(text) AND
             |      CAST(conv(substring(md5(substring(text, i, 8)), 1, 7), 16, 10)
             |        AS BIGINT) % $modulus = 0),
             |    i -> i + 7),
             |  array(length(text))))""".stripMargin).as("cuts"),
        col("text"))
      .select(col("source"),
        explode(expr(
          """filter(zip_with(concat(array(0), cuts), concat(cuts, array(-1)),
            |  (a, b) -> struct(a AS s, b AS e)), p -> p.e > p.s)""".stripMargin)).as("p"),
        col("text"))
      .select(col("source"),
        md5(expr("substring(text, p.s + 1, p.e - p.s)")).as("block_md5"))

  /** Per-source CAS store stats: total chunk writes, distinct stored
    * blocks, dup rate (ppm, integer), and how many of the source's
    * distinct blocks are shared with ≥1 other source (cross-source
    * dedup potential). */
  def stats(docs: DataFrame, modulus: Int = 64): DataFrame = {
    val per = chunks(docs, modulus)
      .groupBy(col("source"), col("block_md5")).agg(count(lit(1)).as("n"))
    val bySrc = per.groupBy(col("source"))
      .agg(sum(col("n")).as("n_chunks"), count(lit(1)).as("n_distinct"))
    val crossShared = per
      .withColumn("nsrc", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("block_md5"))))
      .where(col("nsrc") > 1)
      .groupBy(col("source")).agg(count(lit(1)).as("n_cross_shared"))
    bySrc.join(crossShared, Seq("source"), "left")
      .na.fill(0L, Seq("n_cross_shared"))
      .select(col("source"), col("n_chunks"), col("n_distinct"),
        expr("((n_chunks - n_distinct) * 1000000L) div n_chunks").as("dup_ppm"),
        col("n_cross_shared"))
  }
}
