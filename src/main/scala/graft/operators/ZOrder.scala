package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional data-layout tool:
  * interleaving the bits of two sort dimensions makes file-level zone
  * maps (per-file min/max) selective for predicates on EITHER dimension,
  * where a row-major sort is selective only for its leading prefix.
  * Delta/Iceberg expose the same idea as OPTIMIZE ZORDER BY; here it is
  * an explicit, engine-reproducible expression, so the layout decision
  * is auditable (q61 measures zone-map pruning z-order vs row-major on
  * the same data, same bucket count).
  *
  * The interleave is UNROLLED into a plain integer expression tree
  * (shift/and/add per bit) — whole-stage-codegen'd, no higher-order
  * folds, no UDF; identical arithmetic in DuckDB via list_sum.
  *
  * Scale posture: zValue is map-only; clustering a 100 TB table is
  * `repartitionByRange(zValue)` + write, and the zone maps that make
  * scans cheap afterwards are exactly the parquet min/max statistics
  * Spark already collects per file.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative integer
    * columns: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * 2·bits ≤ 62 keeps the result positive in signed 64-bit. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    // long arithmetic throughout: bit 2i+1 of the result exceeds int
    // range from bits = 16 up, and int shiftleft would silently wrap
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Zone map over `df` bucketed by `keyCol div bucketSize`: per-bucket
    * row count and min/max of each dimension column — the per-file
    * statistics a scan planner prunes with. */
  def zoneMap(df: DataFrame, keyCol: String, bucketSize: Long,
              dims: Seq[String]): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    val aggs = count(lit(1)).as("n_rows") +:
      dims.flatMap(d => Seq(min(col(d)).as(s"min_$d"), max(col(d)).as(s"max_$d")))
    df.groupBy(expr(s"$keyCol div $bucketSize").as("bucket"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
