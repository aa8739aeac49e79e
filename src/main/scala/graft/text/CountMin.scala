package graft.text

import graft.Graft.LeaseOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Count-Min sketch over a token stream (Cormode & Muthukrishnan,
  * J. Algorithms 2005) — the bounded-state frequency estimator that
  * complements the KMV cardinality sketch (q51): `depth × width`
  * integer counters answer point frequency queries with one-sided
  * error (estimate ≥ truth, overshoot ≤ εN with prob. 1−δ).
  *
  * Engine-reproducible by construction: the row hashes are md5-derived
  * ([[PortableHash.h28]] of "row:token"), the counters are exact
  * integer sums, and the point estimate is an exact integer min — so
  * unlike a murmur-hashed sketch, the DuckDB oracle reproduces every
  * counter and every estimate bit-for-bit.
  *
  * Scale posture (100 TB): building the sketch is a map-side-combinable
  * groupBy onto at most depth·width keys — the shuffle carries partial
  * counters, never tokens, and the sketch itself is O(depth·width)
  * regardless of corpus size (the whole point). Sketches built per
  * partition/day/source merge by cell-wise addition. The estimate join
  * below is the AUDIT path (it also carries exact counts to measure
  * overshoot); a production consumer holds the sketch broadcast-side
  * and probes it without any join.
  */
object CountMin {

  /** The cell a token hashes to in sketch row `r`: h28("r:tok") % width
    * — the per-row salt is folded into the md5 input. Shared with the
    * streaming twin ([[graft.streaming.StreamCountMin]]) so stream- and
    * batch-built counters land in identical cells. */
  private[graft] def cell(width: Int) =
    PortableHash.h28(concat_ws(":", col("r").cast("string"), col("tok"))).mod(width)

  /** Sketch counters from a VOCABULARY-sized (tok, cnt) count table:
    * one row per non-empty cell — (r, bucket, cnt). A cell's counter is
    * the sum of the counts of the tokens hashing there, so building
    * from pre-aggregated counts yields bit-identical counters to
    * per-occurrence insertion while hashing each DISTINCT token depth
    * times instead of each occurrence (the r7 bench's q55 cost was
    * exactly depth md5s × corpus tokens in the hot map stage). */
  def sketchFromCounts(tokenCounts: DataFrame, depth: Int = 4,
                       width: Int = 1024): DataFrame = {
    require(depth > 0 && width > 0, "sketch dimensions must be positive")
    tokenCounts
      .select(col("tok"), col("cnt").as("tok_cnt"),
        explode(expr(s"sequence(0, ${depth - 1})")).as("r"))
      .select(col("r"), cell(width).as("bucket"), col("tok_cnt"))
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col("tok_cnt")).as("cnt"))
  }

  /** Sketch counters from a (tok) token-occurrence table — reduces the
    * stream to counts first (map-side combined; the shuffle carries
    * vocabulary partials, never tokens), then hashes the vocabulary. */
  def sketch(toks: DataFrame, depth: Int = 4, width: Int = 1024): DataFrame =
    sketchFromCounts(toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt")),
      depth, width)

  /** Point-frequency audit over `docs` (doc_id, text): build the sketch
    * from all whitespace tokens, then for the `topK` most frequent
    * tokens report the exact count next to the sketch estimate
    * (min over the token's depth cells). Output:
    * (tok, true_cnt, cm_estimate) — cm_estimate ≥ true_cnt always. */
  def frequencyAudit(docs: DataFrame, depth: Int = 4, width: Int = 1024,
                     topK: Int = 50): DataFrame = {
    val toks = graft.Par.fanOut(docs)
      .select(explode(expr("filter(split(text, ' '), w -> w != '')")).as("tok"))
    // one corpus pass: everything downstream (counters AND estimates)
    // derives from the vocabulary-sized exact-count table
    val truth = toks.groupBy(col("tok")).agg(count(lit(1)).as("true_cnt")).leased
    val counters = sketchFromCounts(
      truth.select(col("tok"), col("true_cnt").as("cnt")), depth, width)
    truth
      .select(col("tok"), col("true_cnt"), explode(expr(s"sequence(0, ${depth - 1})")).as("r"))
      .withColumn("bucket", cell(width))
      .join(broadcast(counters), Seq("r", "bucket"))
      .groupBy(col("tok"), col("true_cnt"))
      .agg(min(col("cnt")).as("cm_estimate"))
      .orderBy(col("true_cnt").desc, col("tok"))
      .limit(topK)
  }
}
