package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the centrality
  * counterpart to [[Components]]: components tell you WHICH docs form a
  * duplicate blob, PageRank ranks them WITHIN the corpus graph, e.g. to
  * pick the canonical representative of a near-dup cluster (highest
  * centrality = the version most other variants point at) or to weight
  * quality scores by graph importance.
  *
  * Numerics: power iteration in INTEGER fixed point so Spark and the
  * DuckDB oracle agree bit-for-bit (reference: docs/cheat-sheets
  * conventions; see also q90's truncation note). Ranks are BIGINT in
  * units of 1e-6 ("prmicro"): r0 = 1_000_000 for every node; each
  * iteration
  *
  *   r'(v) = 150_000 + Σ_{u→v} (r(u) * 85 div 100) div outdeg(u)
  *
  * i.e. damping 0.85 with the usual (1-d) teleport base. All operands
  * are nonnegative, so Spark's truncating `div` and DuckDB's flooring
  * `//` agree; per-edge contributions are computed independently and
  * summed as BIGINT — exact and summation-order-immune. A FIXED
  * iteration count (no convergence test) keeps the result a pure
  * function of the input, replayable by chained oracle CTEs.
  *
  * Scale posture (100 TB): each iteration is ONE shuffle join of the
  * narrow symmetric edge list against the (id, rank) table plus a
  * sum-aggregate — the Pregel message-passing shape with no driver
  * state. Degrees are computed once and cached with the edges.
  * `localCheckpoint` per round truncates lineage (reliable `checkpoint`
  * on a real cluster). Iterations are a constant (default 5): near-dup
  * graphs are low-diameter, and downstream consumers need a stable
  * ordering, not convergence to 1e-12.
  */
object PageRank {

  val Scale       = 1000000L // 1.0 in prmicro
  val DampNum     = 85L      // damping 0.85 as 85/100
  val DampDen     = 100L
  val TeleportFix = 150000L  // (1 - 0.85) in prmicro

  /** Rank per node after `iters` damped power iterations. `nodes` must
    * have column `id`; `edges` columns `src`/`dst` (undirected — both
    * orientations are added, duplicates dropped, so outdeg = degree).
    * Nodes touching no edge hold the teleport base from iteration 1 on
    * (they receive no messages) and are unioned back without iterating —
    * only the edge subgraph shuffles, as in [[Components.minLabel]].
    * Output: (id, pr_fix) with pr_fix in prmicro. */
  def ranks(nodes: DataFrame, edges: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1 (got $iters)")
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .dropDuplicates("src", "dst")
      .persist()
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("outdeg")).persist()
    deg.count() // eager fill: every round probes edges + degrees

    // sym holds both orientations, so src alone covers every edge node
    var ranks = Checkpoints.roll(
      deg.select(col("src").as("id"), lit(Scale).as("pr_fix")), None)
    for (_ <- 1 to iters) {
      // per-source contribution (same for each outgoing edge), fanned
      // out along edges, summed at the destination. Every edge node has
      // degree >= 1, so the join back to the node set needs no outer
      // side — msgs covers deg's ids exactly (symmetric edges: every
      // node with an out-edge also has an in-edge).
      val contrib = ranks.join(deg.withColumnRenamed("src", "id"), Seq("id"))
        .select(col("id").as("src"),
          expr(s"((pr_fix * $DampNum) div $DampDen) div outdeg").as("c"))
      ranks = Checkpoints.roll(
        sym.join(contrib, Seq("src"))
          .groupBy(col("dst")).agg(sum(col("c")).as("msg"))
          .select(col("dst").as("id"), (lit(TeleportFix) + col("msg")).as("pr_fix")),
        Some(ranks))
    }
    sym.unpersist(); deg.unpersist()
    Checkpoints.leaseFinal(ranks)
    val singletons = nodes.select(col("id"))
      .join(ranks.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), lit(TeleportFix).as("pr_fix"))
    ranks.union(singletons)
  }

  /** Similarity-WEIGHTED ranks: `edges` carries an integer weight
    * column `w` (e.g. Jaccard ppm), and a node's outflow splits
    * proportionally to edge weight instead of uniformly:
    *
    *   r'(v) = 150_000 + Σ_{u→v} ((r(u) * 85 div 100) * w(u,v)) div W(u)
    *
    * with W(u) = Σ w(u,·). Stronger-similarity edges carry more rank —
    * on a near-dup graph that pulls the canonical pick toward the
    * variant most TIGHTLY duplicated, not merely most-connected.
    * Products stay inside int64: r ≤ n·10^6 prmicro, ×85, ×w ≤ 10^6
    * — bounded by 10^14·n-ish; same plan shape and determinism as
    * [[ranks]] (one join+sum per iteration, all operands nonneg). */
  def ranksWeighted(nodes: DataFrame, edges: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1 (got $iters)")
    val sym = edges.select(col("src"), col("dst"), col("w"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .dropDuplicates("src", "dst")
      .persist()
    val wsum = sym.groupBy(col("src")).agg(sum(col("w")).as("wtot")).persist()
    wsum.count()

    var ranks = Checkpoints.roll(
      wsum.select(col("src").as("id"), lit(Scale).as("pr_fix")), None)
    for (_ <- 1 to iters) {
      // per-EDGE contribution this time (outflow splits by weight), so
      // the damped rank and W(u) attach to each edge before the fanout
      val contrib = sym
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(wsum, Seq("src"))
        .select(col("dst"),
          expr(s"(((pr_fix * $DampNum) div $DampDen) * w) div wtot").as("c"))
      ranks = Checkpoints.roll(
        contrib.groupBy(col("dst")).agg(sum(col("c")).as("msg"))
          .select(col("dst").as("id"), (lit(TeleportFix) + col("msg")).as("pr_fix")),
        Some(ranks))
    }
    sym.unpersist(); wsum.unpersist()
    Checkpoints.leaseFinal(ranks)
    val singletons = nodes.select(col("id"))
      .join(ranks.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), lit(TeleportFix).as("pr_fix"))
    ranks.union(singletons)
  }
}
