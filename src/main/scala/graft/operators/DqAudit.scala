package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality audit — the validation pass a pipeline runs between
  * ingest and publish (the reference enforces the same invariants
  * implicitly: SCD2 requires unique business keys per batch, fact build
  * requires resolvable FKs — `/root/reference/docs/guides.md:16`; this
  * operator makes the invariants a REPORT instead of a silent
  * assumption).
  *
  * Each check yields one (check_name, violations) row; the audit never
  * fails the job — a nonzero count is information for the gatekeeper
  * (alerting, quarantine) to act on.
  *
  * Scale posture (100 TB): referential checks are left-anti hash joins
  * on the FK — the dimension side deduplicates to its key column first,
  * so the shuffle carries keys, not rows; AQE broadcasts genuinely
  * small dims. Duplicate-key and null/range checks are single
  * aggregates with map-side combine. Each check is one scan + at most
  * one shuffle; checks are independent (a scheduler can fan them out).
  */
object DqAudit {

  /** One audit row: count of `violating` rows in `df`. */
  def countCheck(name: String, df: DataFrame, violating: Column): DataFrame =
    df.where(violating).agg(count(lit(1)).as("violations"))
      .select(lit(name).as("check_name"), col("violations"))

  /** One audit row: rows of `child` whose `fk` resolves to no `key` in
    * `dim` (NULL FKs are orphans too — they resolve to nothing). */
  def fkCheck(name: String, child: DataFrame, fk: String,
              dim: DataFrame, key: String): DataFrame = {
    val keys = dim.select(col(key).as(fk)).dropDuplicates(fk)
    countCheck(name, child.join(keys, Seq(fk), "left_anti"), lit(true))
  }

  /** One audit row: count of `key` values appearing in more than one
    * row of `df` (business keys the SCD2/fact operators assume unique). */
  def dupKeyCheck(name: String, df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .where(col("n") > 1)
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("check_name"), col("violations"))

  /** The standard audit over the corpus star schema: referential
    * integrity of every FK edge, duplicate primary keys, and domain
    * checks (null dates, non-positive amounts). Output:
    * (check_name, violations), one row per check, ordered. */
  def auditStarSchema(spark: SparkSession, dir: String): DataFrame = {
    val orders = graft.Tables.orders(spark, dir)
    val customer = graft.Tables.customer(spark, dir)
    val lineitem = graft.Tables.lineitem(spark, dir)
    val part = graft.Tables.part(spark, dir)
    val supplier = graft.Tables.supplier(spark, dir)
    val nation = graft.Tables.nation(spark, dir)
    val checks = Seq(
      fkCheck("fk_orders_custkey", orders, "o_custkey", customer, "c_custkey"),
      fkCheck("fk_lineitem_orderkey", lineitem, "l_orderkey", orders, "o_orderkey"),
      fkCheck("fk_lineitem_partkey", lineitem, "l_partkey", part, "p_partkey"),
      fkCheck("fk_lineitem_suppkey", lineitem, "l_suppkey", supplier, "s_suppkey"),
      fkCheck("fk_customer_nationkey", customer, "c_nationkey", nation, "n_nationkey"),
      dupKeyCheck("pk_orders_orderkey", orders, "o_orderkey"),
      dupKeyCheck("pk_part_partkey", part, "p_partkey"),
      countCheck("null_orders_orderdate", orders, col("o_orderdate").isNull),
      countCheck("nonpositive_orders_totalprice", orders, col("o_totalprice") <= 0),
      countCheck("nonpositive_lineitem_quantity", lineitem, col("l_quantity") <= 0),
      countCheck("discount_out_of_range", lineitem,
        col("l_discount") < 0 || col("l_discount") > 1))
    checks.reduce(_.union(_)).orderBy("check_name")
  }
}
