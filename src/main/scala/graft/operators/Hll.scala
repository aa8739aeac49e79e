package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch, integer-exact and oracle-replayable.
  *
  * Reference analog: the warehouse's distinct counts (e.g.
  * `/root/reference/docs/cheat-sheets/postgresql.md:102-146` runs plain
  * `count(distinct …)`) — exact distinct is a full shuffle of every key at
  * 100 TB; the sketch shrinks per-group state to [[M]] bytes-ish registers
  * and stays mergeable across batches/partitions (register-wise max), the
  * same incremental-rollup shape as [[IncrementalAgg]]'s KMV (q51/q63).
  *
  * Determinism contract (SURVEY.md §7.4 conventions): the estimator is the
  * textbook alpha·m²/Σ2^−M_j biased-raw HLL, but evaluated ENTIRELY in
  * BIGINT so DuckDB replays it bit-for-bit:
  *  - hash = PortableHash.h60 (md5-derived, identical in both engines);
  *  - register = h mod 64, remainder = h div 64 (54 bits);
  *  - rho = 55 − bit_length(rem), via `length(bin(rem))` — Spark's `bin`
  *    and DuckDB's `bin` both print minimal binary (bin(0)='0');
  *  - Σ2^−M_j is scaled by 2^40: terms are `1L << (40 − least(M_j,40))`,
  *    empty registers contribute 2^40; S ≤ 64·2^40 = 2^46;
  *  - raw = (m²·2^40) div S = 2^52 div S ≤ 2^46;
  *  - alpha_64 ≈ 0.709 is the dyadic rational 726/1024, applied as
  *    `raw·726 div 1024` (max product ≈ 5.1e16 — inside int64).
  * No float ever participates, so the estimates themselves hash-match the
  * oracle. Small-range correction (Flajolet et al.'s linear counting,
  * used below 2.5·m where the raw estimator is badly biased) would need
  * ln() — except that with m registers the empty-register count V takes
  * only m−1 possible values, so m·ln(m/V) is a 64-entry INTEGER LOOKUP
  * TABLE ([[lcTable]]), computed once here and embedded as the same
  * literal array in the oracle SQL. The full estimator stays integer-
  * exact and hash-gated (q95); accuracy at n ≈ m is spec-gated (HllSpec).
  */
object Hll {
  /** Number of registers m (p = 6 index bits). Small by production
    * standards (keeps specs readable); the arithmetic is parametric and
    * the int64 bounds above hold for any m ≤ 4096 with scale 40. */
  val M = 64

  /** rho upper bound: 60-bit hash minus 6 index bits leaves 54 bits, so
    * rho = (# leading zeros of the 54-bit remainder) + 1 ∈ [1, 55]. */
  val RhoMax = 55

  private val Scale = 40
  private val RawNum = 4096L << Scale // m² · 2^40 = 2^52

  /** Linear-counting threshold: below 2.5·m the raw estimator's bias
    * dominates and LC takes over (the textbook switch point). */
  val LcThreshold: Long = 5L * M / 2

  /** lcTable(V) = round(m·ln(m/V)) for V = 1..m−1 empty registers —
    * linear counting as a closed integer table (V is discrete, so ln
    * never runs at query time on either engine). Index 0 is a never-used
    * placeholder (V = 0 keeps the raw estimate). */
  val lcTable: Seq[Long] =
    0L +: (1 until M).map(v => math.round(M * math.log(M.toDouble / v)))

  /** The table as engine / oracle array literals — the same integers
    * rendered in each dialect, so both replay identical estimates
    * (1-based element access in both; position V+1 holds the V-empties
    * estimate). */
  private[graft] def lcTableSpark: String = lcTable.mkString("array(", "L, ", "L)")
  def lcTableDuck: String = lcTable.mkString("[", ", ", "]")

  /** rho of the 54-bit remainder column (BIGINT, null-free). */
  private def rho(rem: Column): Column =
    when(rem === 0L, lit(RhoMax)).otherwise(lit(RhoMax) - length(bin(rem)))

  /** Register index of a 60-bit hash (h is nonnegative, so % is mod). */
  def regOf(h: Column): Column = h % M

  /** rho of a 60-bit hash: leading-zero rank of the remainder after the
    * 6 index bits (shiftright 6 = div 64 for nonnegative h). */
  def rhoOf(h: Column): Column = rho(shiftright(h, 6))

  /** Per-key register table: (key, reg, m_j). Mergeable: the registers of
    * a union of batches are the register-wise MAX of per-batch tables —
    * the partial aggregate is map-side combined, so the shuffle carries at
    * most m rows per key per partition regardless of input size. */
  def registers(df: DataFrame, key: String, hashCol: String): DataFrame =
    df.select(col(key), regOf(col(hashCol)).as("reg"), rhoOf(col(hashCol)).as("rho"))
      .groupBy(col(key), col("reg"))
      .agg(max(col("rho")).as("m_j"))

  /** Merge two register tables (associative + commutative). */
  def merge(a: DataFrame, b: DataFrame, key: String): DataFrame =
    a.unionByName(b).groupBy(col(key), col("reg")).agg(max(col("m_j")).as("m_j"))

  /** Finalize: (key, n_regs, s_sum, hll_estimate) — one row per key.
    * State in: ≤ m rows per key; no further scan of the raw data. The
    * estimate is the raw biased HLL, replaced by the linear-counting
    * table below [[LcThreshold]] when empty registers exist (V = m −
    * n_regs > 0) — the standard small-range switch, integer end to end. */
  def estimate(registers: DataFrame, key: String): DataFrame =
    registers
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_regs"),
        sum(expr(s"shiftleft(1L, cast($Scale - least(m_j, $Scale) as int))")).as("s_obs"))
      .withColumn("s_sum",
        col("s_obs") + (lit(M.toLong) - col("n_regs")) * lit(1L << Scale))
      .withColumn("est_raw", expr(s"(($RawNum div s_sum) * 726) div 1024"))
      .select(col(key), col("n_regs"), col("s_sum"),
        expr(s"""CASE WHEN n_regs < ${M}L AND est_raw <= ${LcThreshold}L
                |     THEN element_at($lcTableSpark, cast(${M}L - n_regs as int) + 1)
                |     ELSE est_raw END""".stripMargin).as("hll_estimate"))
}
