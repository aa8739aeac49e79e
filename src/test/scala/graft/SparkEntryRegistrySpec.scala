package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry drift guard: the driver joins `SparkEntry.queries` with
  * `SparkEntry.oracleSql` by key — a renamed query whose oracle kept the
  * old key silently downgrades from hash-verified to rows-only (or
  * orphans the oracle entirely). Rows-only queries must be a deliberate,
  * enumerated exception, not an accident. */
class SparkEntryRegistrySpec extends AnyFunSuite {

  /** Queries intentionally gated rows-only (no reasonable SQL twin).
    * EMPTY since round 7: q29/q44's search stages are oracle-replayed
    * over the materialized codebooks (r6), and q64's training loop is
    * unrolled into a from-scratch DuckDB re-training (bpeTrainSql) —
    * every registered query is hash-gated. */
  private val RowsOnly = Set.empty[String]

  test("every oracle entry points at a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }

  test("every query is oracle-gated except the enumerated rows-only set") {
    val unGated = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unGated == RowsOnly,
      s"queries without an oracle beyond the deliberate rows-only set: ${unGated -- RowsOnly}")
  }

  test("oracle SQL carries a total ORDER BY (the compare is order-insensitive, dumps should not be)") {
    val missing = SparkEntry.oracleSql.collect {
      case (k, sql) if !sql.toUpperCase.contains("ORDER BY") => k
    }
    assert(missing.isEmpty, s"oracles without ORDER BY: $missing")
  }
}
