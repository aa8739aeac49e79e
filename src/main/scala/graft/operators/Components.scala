package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list by iterative min-label
  * propagation — the last stage of a near-duplicate pipeline: LSH/SimHash
  * emit PAIRS, but dedup must act on CLUSTERS (keep one doc per connected
  * group), and pairs→clusters is a transitive closure Spark has no
  * built-in operator for.
  *
  * Algorithm: every node starts labeled with its own id; each round a
  * node takes the min of its label and its neighbors' labels; at
  * fixpoint label(v) = min node id reachable from v, a canonical
  * component id. Labels only decrease, so the total-sum of labels is a
  * strictly decreasing convergence witness — no changed-row join needed.
  *
  * Scale posture (100 TB):
  *  - Each round is ONE shuffle join of the (narrow, deduped, symmetric)
  *    edge list against the (id, label) table plus a min-aggregate —
  *    no driver-side graph state, edges never leave the cluster.
  *  - Rounds = graph diameter. Near-dup graphs are dense blobs of
  *    mutually-similar docs — diameter is a handful. For adversarial
  *    long-chain graphs switch to the large-star/small-star rewrite
  *    (Kiveris et al., "Connected Components in MapReduce and Beyond",
  *    SoCC'14) — same join-agg primitive, O(log²) rounds; propagation
  *    is the simpler default because dedup graphs don't chain.
  *  - Per-round `localCheckpoint` truncates lineage so the plan does not
  *    grow with iteration count; on a real cluster use reliable
  *    `checkpoint` (HDFS/S3) so a lost executor re-reads the last round,
  *    not the whole history.
  */
object Components {

  /** Component id per node: `nodes` must have column `id`, `edges`
    * columns `src`/`dst` (undirected; either orientation, duplicates
    * fine). Nodes absent from `edges` come back as singletons. Output:
    * (id, component) where component = min reachable id.
    *
    * Only the EDGE SUBGRAPH iterates: nodes touching no edge are
    * singletons by construction and are unioned back label=id at the
    * end. At 100 TB this is the difference between propagating over the
    * whole corpus and propagating over the (typically minuscule)
    * duplicate graph. */
  def minLabel(nodes: DataFrame, edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .dropDuplicates("src", "dst")
      .persist()
    sym.count() // eager fill: every round probes this table

    // sym holds both orientations, so src alone covers every edge node
    var labels = Checkpoints.roll(
      sym.select(col("src").as("id")).dropDuplicates("id")
        .select(col("id"), col("id").as("component")), None)
    var sumOld = checksum(labels)
    var round = 0
    var converged = sumOld == null // no edges → nothing to iterate
    while (!converged && round < maxRounds) {
      round += 1
      // every edge node has a neighbor, so min-with-self needs no outer join:
      // msgs covers labels' ids exactly, and least(own, nbr) keeps monotonicity
      val next = Checkpoints.roll(
        sym
          .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
          .groupBy(col("src")).agg(min(col("component")).as("nbr_min"))
          .join(labels.withColumnRenamed("id", "src"), Seq("src"))
          .select(col("src").as("id"),
            least(col("component"), col("nbr_min")).as("component")),
        Some(labels))
      val sumNew = checksum(next)
      labels = next
      converged = sumNew == sumOld
      sumOld = sumNew
    }
    Checkpoints.leaseFinal(labels) // released even on the loud non-convergence path
    // A silent early stop would return WRONG labels (propagation frozen
    // mid-graph); converging dedup graphs finish in a handful of rounds,
    // so hitting the valve means the input is not the graph this
    // operator is for (use large-star/small-star) — fail loudly.
    if (!converged)
      throw new IllegalStateException(
        s"min-label propagation did not converge within $maxRounds rounds " +
          "(graph diameter too large — switch to the large-star/small-star rewrite)")
    sym.unpersist()
    val singletons = nodes.select(col("id"))
      .join(labels.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    labels.union(singletons)
  }

  /** Chain-cut refinement: re-run the closure over STRONG edges only
    * (similarity ≥ `thresholdPpm` in fixed ppm) and report, per member
    * of a multi-member cluster, the original cluster beside its refined
    * cluster plus a cluster-level `was_split` flag. This is the remedy
    * for transitive over-merge: connected components admit A~B~C with
    * A and C never pairwise verified, so a drift chain rides weak links
    * into one blob; cutting below the strong threshold splits it.
    *
    * `clusters` = (doc_id, cluster_id) — the landed closure;
    * `pairs` = (doc_a, doc_b, jaccard) — the verified edge list.
    * Same bounded [[minLabel]] iteration over a strictly smaller edge
    * list; no text is touched. Output ordered by caller. */
  def chainCut(nodes: DataFrame, clusters: DataFrame, pairs: DataFrame,
               thresholdPpm: Long = 800000L): DataFrame = {
    val strong = pairs
      .filter(expr(s"CAST(floor(jaccard * 1000000.0) AS BIGINT) >= $thresholdPpm"))
    val refined = minLabel(nodes,
        strong.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      .select(col("id").as("doc_id"), col("component").as("refined_cluster_id"))
    val j = clusters.join(refined, Seq("doc_id"))
    val splitFlag = j.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        countDistinct("refined_cluster_id").as("n_refined"))
      .filter(col("n_members") >= 2)
      .select(col("cluster_id"),
        expr("CAST(n_refined > 1 AS INT)").as("was_split"))
    j.join(splitFlag, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("refined_cluster_id"),
        col("was_split"))
  }

  /** Decimal sum of labels — decreasing-monotone fixpoint witness
    * (decimal so huge id spaces cannot overflow int64). */
  private def checksum(labels: DataFrame): java.math.BigDecimal =
    labels.agg(sum(col("component").cast("decimal(38,0)")).as("s"))
      .first().getDecimal(0)
}
