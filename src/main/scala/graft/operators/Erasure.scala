package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten erasure — the compliance delete every data
  * platform must implement: remove every row keyed to a victim id
  * across the warehouse, and AUDIT the result (counts per table plus a
  * post-delete leak check computed from the erased output, never
  * assumed).
  *
  * Scale posture: erasure is one key-hashed left-anti join per table —
  * victim sets are tiny relative to the corpus (broadcast side), so
  * the delete costs one scan per table; the audit's four counts per
  * table are 1-row aggregates crossJoined (all broadcast). At 100 TB
  * the erased tables land via [[graft.sources.Ingest.overwriteSwap]]
  * exactly like an SCD rewrite.
  */
object Erasure {

  /** Remove every row of `df` whose `keyCol` appears in `victims`
    * (a single-column `key` frame). */
  def erase(df: DataFrame, keyCol: String, victims: DataFrame): DataFrame =
    df.join(
      victims.select(col("key")).dropDuplicates("key").withColumnRenamed("key", keyCol),
      Seq(keyCol), "left_anti")

  /** One audit row per (name, table, keyCol): n_before, n_deleted,
    * n_after, n_leaked — the leak count comes from re-probing the
    * ERASED output against the victim set, so a broken erase shows up
    * as n_leaked > 0 rather than being defined away. */
  def audit(tables: Seq[(String, DataFrame, String)], victims: DataFrame): DataFrame = {
    require(tables.nonEmpty, "audit needs at least one table")
    val v = victims.select(col("key")).dropDuplicates("key").persist()
    tables.map { case (name, df, keyCol) =>
      val vk = v.withColumnRenamed("key", keyCol)
      val kept = erase(df, keyCol, v)
      df.agg(count(lit(1)).as("n_before"))
        .crossJoin(df.join(vk, Seq(keyCol), "left_semi").agg(count(lit(1)).as("n_deleted")))
        .crossJoin(kept.agg(count(lit(1)).as("n_after")))
        .crossJoin(kept.join(vk, Seq(keyCol), "left_semi").agg(count(lit(1)).as("n_leaked")))
        .select(lit(name).as("table_name"), col("n_before"), col("n_deleted"),
          col("n_after"), col("n_leaked"))
    }.reduce(_ union _)
  }
}
