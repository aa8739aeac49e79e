package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry drift guard: the driver joins `SparkEntry.queries` with
  * `SparkEntry.oracleSql` by key — a renamed query whose oracle kept the
  * old key silently downgrades from hash-verified to rows-only (or
  * orphans the oracle entirely). Rows-only queries must be a deliberate,
  * enumerated exception, not an accident. */
class SparkEntryRegistrySpec extends AnyFunSuite {

  /** Queries intentionally gated rows-only (no reasonable SQL twin).
    * Round 6 moved q29/q44 OUT of this set: their search stages are
    * oracle-replayed over the materialized codebooks; only the BPE
    * training argmax loop remains (its encode stage is gated by q72). */
  private val RowsOnly = Set("q64_bpe_merges")

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
