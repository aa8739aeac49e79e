package graft.text

import graft.Graft.LeaseOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004) —
  * PageRank over the word co-occurrence graph, the classic unsupervised
  * keyword scorer an LLM-curation pipeline runs beside frequency-based
  * keywording (q39): a word matters if it co-occurs with words that
  * matter.
  *
  * Graph: undirected, nodes = corpus vocabulary, edge weight = number
  * of co-occurrences within a `window`-token sliding window (the q93
  * pairing). Scores iterate the weighted PageRank recurrence
  * WS(v) = (1−d) + d·Σ_{u∈adj(v)} w_uv/strength(u) · WS(u) for a FIXED
  * iteration count — fixed, because a convergence test is a
  * data-dependent driver round-trip per step, while T iterations of a
  * contraction with factor d=0.85 bound the error at d^T ≈ 0.44% for
  * T=5: plenty under a 10^-6 fixed-point grid.
  *
  * Determinism contract: scores are integer MICROS end to end — init
  * 10^6, damping as (85·S) div 100 with S = Σ (w·ws) div strength —
  * so iteration results are partitioning/order-independent exact
  * integers and the oracle (the same recurrence unrolled in DuckDB
  * CTEs) hash-matches.
  *
  * Scale posture (100 TB): the graph is VOCABULARY-bounded, not
  * corpus-bounded — nodes = distinct tokens, edges = distinct
  * co-occurring pairs; the corpus-sized token stream is reduced by one
  * map-side-combined count before any iteration. Each iteration is one
  * hash join (edges ⋈ scores on src — both vocabulary-sized) plus one
  * map-side-combined sum keyed on dst. T iterations = T bounded jobs,
  * the standard distributed PageRank loop; edges and strengths persist
  * across iterations.
  */
object TextRank {

  /** Top-`topK` keywords as (tok, ws_micro), highest score first.
    * Input: docs(doc_id, text). */
  def keywords(docs: DataFrame, window: Int = 3, iters: Int = 5,
               topK: Int = 20): DataFrame =
    keywordsFromPairs(Cooccur.pairCounts(docs, window), iters, topK)

  /** The PageRank half, over an already-derived (or warehouse-
    * materialized) undirected pair-count table (tok_a, tok_b, w) —
    * [[Cooccur.pairCounts]]'s shape. */
  def keywordsFromPairs(pairCounts: DataFrame, iters: Int = 5,
                        topK: Int = 20): DataFrame = {
    require(iters >= 1 && topK >= 1)
    val und = pairCounts.where(col("tok_a") =!= col("tok_b")) // no self-loops
    // symmetric directed edge list + per-node strength, persisted: both
    // are probed once per iteration (vocabulary-sized state)
    val edges = und.select(col("tok_a").as("src"), col("tok_b").as("dst"), col("w"))
      .unionByName(und.select(col("tok_b").as("src"), col("tok_a").as("dst"), col("w")))
      .leased
    val sw = edges.groupBy(col("src")).agg(sum(col("w")).as("sw")).leased
    var ws = sw.select(col("src").as("tok"), lit(1000000L).as("ws"))
    for (_ <- 1 to iters) {
      ws = edges
        .join(ws.withColumnRenamed("tok", "src"), Seq("src"))
        .join(sw, Seq("src"))
        .select(col("dst").as("tok"), expr("(w * ws) div sw").as("c"))
        .groupBy(col("tok")).agg(sum(col("c")).as("s"))
        .select(col("tok"), expr("150000L + (85L * s) div 100L").as("ws"))
    }
    ws.select(col("tok"), col("ws").as("ws_micro"))
      .orderBy(col("ws_micro").desc, col("tok")).limit(topK)
  }
}
