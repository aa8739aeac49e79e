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
}
