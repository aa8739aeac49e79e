package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Deterministic stratified sampling — corpus mixing for training-data
  * pipelines: take exactly k documents per stratum (language, source,
  * quality bucket), chosen by md5-hash order so the sample is (a) stable
  * across runs and engines, (b) unbiased w.r.t. any upstream ordering,
  * and (c) reproducible by the DuckDB oracle bit-for-bit (no RNG state).
  *
  * Scale posture (100 TB): one shuffle (hash-partition by stratum) into
  * a rank-≤-k filter that Spark 4 rewrites to WindowGroupLimit — each
  * map task keeps only its local top-k per stratum before the shuffle,
  * so the exchange carries O(k × strata) rows per task, not the corpus.
  * A hot stratum (most of the web is English) therefore costs its
  * reducer only k rows, not the stratum's full size.
  */
object Sampling {

  /** Exactly min(k, |stratum|) rows per stratum, by (h60(key), key)
    * order. `key` must be unique (it tiebreaks the hash order). Output:
    * input columns + `smp_rank` (1-based within stratum). */
  def stratifiedHashSample(df: DataFrame, stratum: String, key: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(col(stratum))
      .orderBy(PortableHash.h60(col(key).cast("string")), col(key))
    df.withColumn("smp_rank", row_number().over(w))
      .where(col("smp_rank") <= k)
  }

  /** Deterministic EPOCH SHUFFLE — the training-side dataloader order:
    * a seeded global permutation of the corpus (`pos` = rank under
    * md5-hash order, 0-based) plus the round-robin worker assignment
    * every data-parallel trainer derives from it (`worker` =
    * pos mod nWorkers). Epoch e and epoch e+1 are INDEPENDENT
    * permutations of the same corpus (the hash key folds the epoch
    * in), each reproducible anywhere — no RNG state, no collected
    * order, so a resumed job re-derives byte-identical batches.
    *
    * The global rank is the two-level [[graft.operators.PrefixSum]]
    * shape, NOT a global window: 60-bit hash keys split into
    * `1 << bucketBits` order-respecting buckets (top bits of the
    * hash), per-bucket counts make the tiny offset table, and the
    * in-bucket rank window runs partitioned (parallel). Hash ties
    * break on doc_id, so collisions cost correctness nothing.
    *
    * Scale: one map stage (hash), one #buckets-row scan, one
    * partitioned window — the q38 argument; a naive
    * `row_number() OVER (ORDER BY h)` would funnel 100 TB through one
    * task. */
  def epochShuffle(docs: DataFrame, idCol: String = "doc_id", epoch: Int = 1,
                   nWorkers: Int = 8, bucketBits: Int = 10): DataFrame = {
    require(nWorkers > 0, "nWorkers must be positive")
    require(bucketBits >= 0 && bucketBits <= 40, "bucketBits out of range")
    val keyed = docs
      .withColumn("__h", PortableHash.h60(
        concat(lit(s"ep:$epoch:"), col(idCol).cast("string"))))
      .withColumn("__bucket", expr(s"__h div ${1L << (60 - bucketBits)}"))
    val offsets = keyed.groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__offset",
        coalesce(sum(col("__bn")).over(
          Window.orderBy(col("__bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bucket"), col("__offset"))
    val inBucket = Window.partitionBy(col("__bucket"))
      .orderBy(col("__h"), col(idCol))
    keyed.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("pos", col("__offset") + row_number().over(inBucket) - 1)
      .withColumn("worker", pmod(col("pos"), lit(nWorkers.toLong)))
      .drop("__h", "__bucket", "__offset")
  }
}
