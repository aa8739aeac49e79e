package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's runtime
  * skew-join split (on by default in Spark 4) can't help, e.g. a single
  * hot key that exceeds one executor's memory in a shuffle join that
  * AQE didn't classify, or a deterministic-layout requirement.
  *
  * Shape: the big (skewed) side gets a deterministic salt in
  * [0, buckets) hashed from its entire row; the small side is exploded
  * ×buckets so every (key, salt) bucket finds its match. The hot key's
  * rows spread over `buckets` tasks instead of one.
  *
  * The salt uses Spark's xxhash64 — engine-local is fine here because
  * the salt NEVER appears in results (dropped after the join); only
  * row placement depends on it.
  */
object SkewJoin {

  /** Inner-join `big` (skewed) with `small` on `keys`, spreading each
    * key over `buckets` shuffle partitions. Result equals
    * `big.join(small, keys)` row-for-row. */
  def salted(big: DataFrame, small: DataFrame, keys: Seq[String], buckets: Int = 16): DataFrame = {
    require(buckets > 0)
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(buckets)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(expr(s"sequence(0, ${buckets - 1})")))
    saltedBig.join(saltedSmall, keys :+ "__salt").drop("__salt")
  }

  /** [[salted]] driven by the q71 skew audit instead of a fixed bucket
    * count: count the big side's keys, take the keys whose frequency
    * exceeds `hotMultiple`× the median key frequency (the audit's spike
    * rule; median via the frequency-of-frequency table, which stays
    * tiny at any key cardinality), and salt ONLY those — each hot key
    * spreads over ceil(cnt/median) buckets (capped at `maxBuckets`),
    * cold keys keep salt 0 and the small side is NOT replicated for
    * them. A fixed global salt replicates the small side ×buckets for
    * every key; here replication is proportional to measured skew, so
    * the shuffle stays near the unsalted volume while the hot rows
    * still fan out.
    *
    * The audit is one aggregate over the big side's keys. At 100 TB,
    * pass the nightly-materialized audit via `precomputedHot`
    * ((keys..., __buckets int) — q71's report is exactly this shape);
    * placement correctness never depends on the counts being fresh,
    * only balance does, so a stale audit degrades gracefully.
    *
    * Result equals `big.join(small, keys)` row-for-row (SkewJoinSpec
    * pins it, and q31's oracle gates the aggregate downstream). */
  def saltedAudited(big: DataFrame, small: DataFrame, keys: Seq[String],
                    hotMultiple: Int = 2, maxBuckets: Int = 64,
                    maxHotKeys: Int = 1024,
                    precomputedHot: Option[DataFrame] = None): DataFrame = {
    require(hotMultiple >= 1 && maxBuckets > 0 && maxHotKeys > 0)
    val kc = keys.map(col)
    val hot = precomputedHot.getOrElse {
      val freq = big.groupBy(kc: _*).agg(count(lit(1)).as("__cnt"))
      val dist = freq.groupBy(col("__cnt")).agg(count(lit(1)).as("__nk"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("__cnt"))
      val med = dist
        .withColumn("__cum", sum(col("__nk")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
        .crossJoin(broadcast(freq.agg(count(lit(1)).as("__n"))))
        .where(col("__cum") * 2 >= col("__n") + 1)
        .agg(min(col("__cnt")).as("__med"))
      freq.crossJoin(broadcast(med))
        .where(col("__cnt") > col("__med") * hotMultiple)
        .orderBy(col("__cnt").desc +: kc: _*).limit(maxHotKeys)
        .select(kc :+ least(lit(maxBuckets.toLong),
          ceil(col("__cnt").cast("double") / col("__med"))).cast("int").as("__buckets"): _*)
    }
    // clamp __buckets to >= 1: the computed audit always produces >= 3,
    // but precomputedHot is an external input — a 0/negative bucket
    // count would otherwise DROP every row of that key silently (empty
    // sequence() on the small side, NULL pmod salt on the big side)
    val hotSafe = hot.withColumn("__buckets",
      greatest(lit(1), col("__buckets").cast("int")))
    val saltedBig = big.join(broadcast(hotSafe), keys, "left")
      .withColumn("__salt",
        when(col("__buckets").isNotNull,
          pmod(xxhash64(big.columns.map(col): _*), col("__buckets")).cast("int"))
          .otherwise(lit(0)))
      .drop("__buckets")
    val saltedSmall = small.join(broadcast(hotSafe), keys, "left")
      .withColumn("__salt", explode(expr("sequence(0, coalesce(__buckets, 1) - 1)")))
      .drop("__buckets")
    saltedBig.join(saltedSmall, keys :+ "__salt").drop("__salt")
  }
}
