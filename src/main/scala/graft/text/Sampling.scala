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
}
