package graft.vector

import graft.Graft.LeaseOps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity-search operators over an
  * embedding column (`Array[Float]`, cast to doubles once at the scan).
  *
  * Two paths, matching how a 100 TB pipeline actually runs:
  *  - [[knnBruteForce]]: exact top-k within a blocking key (here the
  *    corpus `label`; in production a coarse IVF cell id). The quadratic
  *    cost is confined to a block; the join shuffles both sides once on
  *    the block key. Never call without a blocking column.
  *  - [[annLsh]]: random-hyperplane LSH — sign-bit bucket per vector
  *    (pure map stage), then exact top-k *within* buckets. This is the
  *    sub-quadratic scale path; recall vs. brute force is measured in
  *    the test suite, and bucket width (number of planes) trades recall
  *    for cost.
  *
  * Dot products run as a sequential left fold over doubles —
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, +)` — which is
  * bit-identical to DuckDB's `list_dot_product`, so cosine scores
  * hash-match the oracle with no rounding.
  *
  * Hyperplanes are md5-derived ([[graft.functions.PortableHash]] scheme):
  * w[j][i] = (h28("hp_<j>_<i>") mod 2001) − 1000 — deterministic,
  * seedless, reproducible in any engine with md5.
  */
object Similarity {

  /** Dot product of two array<double> column names via the native
    * codegen'd [[graft.functions.VecDot]] expression — the same
    * sequential left fold as `aggregate(zip_with(a, b, (x,y) -> x*y),
    * 0.0, +)` (bit-identical results, so DuckDB `list_dot_product`
    * oracles still hash-match) without the interpreted
    * higher-order-function overhead in the pair-join hot loop. */
  def dotExpr(a: String, b: String): Column =
    expr(s"vec_dot($a, $b)")

  /** [[dotExpr]] over Column operands (e.g. a literal centroid/plane). */
  def dotCol(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  /** Vectors with their L2 norms precomputed (norm once per row, not per
    * pair). Input columns: vec_id, label, embedding: array<float>. */
  private def prepared(embeddings: DataFrame): DataFrame =
    graft.Par.fanOut(embeddings)
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("nrm", sqrt(dotExpr("v", "v")))
      .select(col("vec_id"), col("label"), col("v"), col("nrm"))

  /** Per-query top-k of candidate `pairs(qid, nid, cosine)` via the
    * BOUNDED `top_k_pairs` aggregate ([[graft.functions.TopKPairs]]) —
    * ≡ `row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid)
    * <= k`, but the aggregation state is k pairs per query instead of a
    * full per-query sort of every candidate (the dominant shuffle+sort
    * of the ANN queries at scale). Output: qid, rank, nid, cosine. */
  private[vector] def topK(pairs: DataFrame, k: Int): DataFrame =
    pairs.groupBy(col("qid")).agg(expr(s"top_k_pairs(nid, cosine, $k)").as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("r0", "p")))
      .select(col("qid"), (col("r0") + 1).as("rank"), col("p.id").as("nid"),
        col("p.score").as("cosine"))
      .orderBy("qid", "rank")

  /** Exact cosine top-k per vector within its `blockCol` block.
    * Output: qid, rank (1..k), nid, cosine — ties broken by nid.
    * The prepared (vector, norm) table is persisted: the pair join
    * probes it twice, and recomputing norms per side doubles the work.
    *
    * Blocking is ENFORCED by the API, not a scaladoc plea: the input
    * must carry `blockCol` (corpus `label`; in production a coarse IVF
    * cell id) — the quadratic pair cost is only survivable when confined
    * to a block. An intentional global scan must say so by adding a
    * constant block column (`withColumn("label", lit(0))`). */
  def knnBruteForce(embeddings: DataFrame, k: Int = 3, blockCol: String = "label"): DataFrame = {
    require(embeddings.columns.contains(blockCol),
      s"knnBruteForce requires blocking column '$blockCol' " +
        "(all-pairs without a block does not scale; add lit(0) to force a global scan)")
    val e = prepared(embeddings.withColumn("label", col(blockCol))).leased
    val q = e.select(col("vec_id").as("qid"), col("label"),
      col("v").as("va"), col("nrm").as("na"))
    val n = e.select(col("vec_id").as("nid"), col("label"),
      col("v").as("vb"), col("nrm").as("nb"))
    val pairs = q.join(n, Seq("label")).where(col("qid") =!= col("nid"))
      .withColumn("cosine", dotExpr("va", "vb") / (col("na") * col("nb")))
    topK(pairs, k)
  }

  /** Embedding-cosine near-duplicate pairs: all (a < b) pairs inside a
    * `blockCol` block with cosine ≥ `threshold` — the thresholded
    * sibling of [[knnBruteForce]] (dedup semantics instead of
    * retrieval), with the SAME enforced blocking discipline: the block
    * must be CORPUS-INDEPENDENT (an IVF cell id — [[cosineNearDupInCells]]
    * is the production form) or the in-block join is quadratic in the
    * corpus. A fixed-cardinality label is NOT a valid block at scale:
    * block width = corpus/|labels|, so pair count grows quadratically
    * with the corpus (measured: 20M pairs at sf1 under the 5-value
    * corpus label). An intentional global scan must say so with
    * `withColumn("block", lit(0))`. */
  def cosineNearDup(embeddings: DataFrame, threshold: Double = 0.4,
                    blockCol: String = "label"): DataFrame = {
    require(embeddings.columns.contains(blockCol),
      s"cosineNearDup requires blocking column '$blockCol' " +
        "(all-pairs without a block does not scale; add lit(0) to force a global scan)")
    val e = prepared(embeddings.withColumn("label", col(blockCol))).leased
    val a = e.select(col("vec_id").as("vec_a"), col("label"),
      col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("label"),
      col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("label")).where(col("vec_a") < col("vec_b"))
      .withColumn("cosine", dotExpr("va", "vb") / (col("na") * col("nb")))
      .where(col("cosine") >= lit(threshold))
      .select(col("vec_a"), col("vec_b"), col("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  /** [[cosineNearDup]] blocked by the TRAINED IVF cell — the scale-safe
    * production form (the [[semanticDedup]] shape, emitting the pair
    * list instead of drop decisions): candidate pairs exist only inside
    * a cell of the materialized `ivf_assign` artifact (rn = 1 rows), so
    * the quadratic is bounded by the ~[[graft.warehouse.Warehouse.IvfCellWidth]]-vector
    * cell width — corpus-independent by construction, because the
    * codebook's cell count scales with the corpus at fixed cell width.
    * Cross-cell near-dups at the cell boundary are the accepted
    * SemDeDup trade-off (recall rises with finer codebooks).
    *
    * The cell join is salted ([[CellSalt]]) for the same reason as
    * [[annIvfWithAssign]]: ncells join keys alone would cap pair-eval
    * parallelism at ncells tasks. */
  def cosineNearDupInCells(embeddings: DataFrame, assign: DataFrame,
                           threshold: Double = 0.4): DataFrame = {
    val e = prepared(embeddings).leased
    val cells = assign.where(col("rn") === 1).select(col("vec_id"), col("cell"))
    val a = cells.join(e, Seq("vec_id"))
      .select(col("vec_id").as("vec_a"), col("cell"),
        col("v").as("va"), col("nrm").as("na"))
    val b = cells.join(e, Seq("vec_id"))
      .select(col("vec_id").as("vec_b"), col("cell"),
        col("v").as("vb"), col("nrm").as("nb"))
    graft.operators.SkewJoin.salted(a, b, Seq("cell"), CellSalt)
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cosine", dotExpr("va", "vb") / (col("na") * col("nb")))
      .where(col("cosine") >= lit(threshold))
      .select(col("vec_a"), col("vec_b"), col("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  /** Deterministic md5-derived hyperplane matrix, computed ONCE at
    * plan-build time on the JVM ([[PortableHash.h28jvm]] is the exact
    * twin of the oracle's md5 arithmetic) and shipped as literals — an
    * expression-side md5 would run planes×dim digests per ROW, since
    * lambda-bound variables block constant folding. */
  def planeMatrix(planes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until planes).map(j => (1 to dim).map(i =>
      (graft.functions.PortableHash.h28jvm(s"hp_${j}_$i") % 2001 - 1000).toDouble).toSeq)

  /** Random-hyperplane LSH bucket id (0 .. 2^planes − 1) for column `v`
    * (array<double>): bit j = sign(w_j · v), the same sequential fold as
    * [[dotExpr]] against each literal plane row. */
  def bucketExpr(planes: Int, dim: Int): Column =
    planeMatrix(planes, dim).zipWithIndex.map { case (row, j) =>
      when(dotCol(typedLit(row), col("v")) > lit(0.0), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF-style ANN: coarse-quantize every vector to its nearest of
    * `ncells` centroids (here the first `ncells` vectors by id — a
    * deterministic stand-in for trained k-means centroids, broadcast
    * exactly as trained ones would be), then exact top-k WITHIN the
    * probe's own cell. The production path for billion-vector corpora:
    * assignment is a broadcast map stage, search cost divides by the
    * cell count; recall rises with multi-probe (nprobe>1 = take top-n
    * cells in the assignment window — same plan shape). */
  def annIvf(embeddings: DataFrame, ncells: Int = 8, k: Int = 3, nprobe: Int = 1): DataFrame = {
    val e = prepared(embeddings).leased
    val cent = e.orderBy("vec_id").limit(ncells)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    ivfSearch(e, cent, k, nprobe)
  }

  /** IVF ANN with TRAINED centroids: deterministic spherical k-means
    * ([[trainIvfCentroids]]) replaces the first-N-by-id stand-in — the
    * production claim behind the IVF path. Training reuses the same
    * prepared/persisted vector table the search probes.
    * Defaults picked by measurement (sf0.001 recall@3 vs global brute
    * force / sf0.1 wall time, 1/4 training sample): 16 cells × 6 probes
    * gives recall 0.708 at the SAME pair budget as 8×3 (nprobe/ncells =
    * 0.375 either way) because finer cells cluster tighter and balance
    * better — vs 0.641 @ 8×3 and 0.435 for first-N centroids @ 8×2.
    * Gated in SimilaritySpec. */
  def annIvfTrained(embeddings: DataFrame, ncells: Int = 16, k: Int = 3,
                    nprobe: Int = 6, iters: Int = 3, sampleMod: Int = 4): DataFrame = {
    val e = prepared(embeddings).leased
    val cents = trainFromPrepared(e, ncells, iters, sampleMod)
    ivfSearch(e, codebookDf(embeddings.sparkSession, cents), k, nprobe)
  }

  /** A centroid matrix as the (cid, cv, cnrm) codebook table the IVF
    * search probes — the literal-sized artifact a production pipeline
    * persists next to the index and broadcasts at query time. */
  def codebookDf(spark: org.apache.spark.sql.SparkSession,
                 cents: Seq[Seq[Double]]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex
      .map { case (c, i) => (i.toLong, c, math.sqrt(c.map(x => x * x).sum)) }
      .toDF("cid", "cv", "cnrm")
  }

  /** IVF search against a PRE-TRAINED codebook (cid, cv, cnrm) — the
    * per-query path once [[trainIvfCentroids]] has run. Training a
    * codebook inside every retrieval query is the dim-rebuild
    * anti-pattern in vector clothing: at 100 TB the codebook is trained
    * once per corpus build (see graft.warehouse.Warehouse) and queries
    * only pay assignment + in-cell search. */
  def annIvfWithCodebook(embeddings: DataFrame, codebook: DataFrame,
                         k: Int = 3, nprobe: Int = 6): DataFrame =
    ivfSearch(prepared(embeddings).leased,
      codebook.select(col("cid"), col("cv"), col("cnrm")), k, nprobe)

  /** The full ranked cell assignment (vec_id, cell, rn) for every vector
    * against a trained codebook — rn = 1 is the vector's own (index)
    * cell, rn ≤ nprobe its probe set. This IS the IVF index a production
    * system materializes beside the codebook (FAISS's inverted lists,
    * relationally): per-vector state bounded by ncells rows of three
    * ints, built once per corpus so retrieval queries join it instead of
    * re-ranking centroids per query (see graft.warehouse.Warehouse).
    * Tie-break matches [[ivfSearchCore]]: (−ccos, cid) struct sort. */
  def cellAssignments(embeddings: DataFrame, codebook: DataFrame,
                      maxRank: Int = Int.MaxValue): DataFrame =
    cellAssignmentsPrepared(prepared(embeddings), collectCodebook(codebook), maxRank)

  /** [[cellAssignments]] over an already-[[prepared]] frame — callers
    * that probe the same prepared vectors again (search sides, in-cell
    * self-joins) pass their leased frame so the norm pass runs once.
    * `maxRank` truncates the emitted ranking (slice BEFORE the explode,
    * so a bounded artifact never generates the ncells-deep tail it
    * won't keep — at the lifted cell cap that tail is the artifact). */
  private def cellAssignmentsPrepared(e: DataFrame,
                                      cents: Array[(Long, Seq[Double], Double)],
                                      maxRank: Int = Int.MaxValue): DataFrame = {
    require(maxRank >= 1, "maxRank must be positive")
    val spark = e.sparkSession
    if (cents.isEmpty)
      return spark.range(0).select(col("id").as("vec_id"), col("id").as("cell"),
        col("id").cast("int").as("rn"))
    val scored = cents.map { case (cid, cv, cn) =>
      struct((-(dotCol(typedLit(cv.toSeq), col("v")) / (col("nrm") * lit(cn)))).as("nccos"),
        lit(cid).as("cid"))
    }
    val ranked =
      if (maxRank < cents.length) expr(s"slice(__cells, 1, $maxRank)")
      else col("__cells")
    // posexplode_OUTER, deliberately: the plain generator makes the
    // optimizer infer `size(__cells) > 0`, and predicate pushdown drags
    // that filter — carrying the ENTIRE ncells-literal scoring
    // expression — below the fanOut exchange into the file-scan stage,
    // where it re-runs at scan parallelism (measured: 20 s for 20k×39
    // at sf1, ~0.3 s once removed; invisible at sf0.1, ruinous at
    // sf10). The array (and any slice(…, 1, ≥1) of it) is statically
    // non-empty (ncells ≥ 1 — the empty codebook returns above), so
    // outer ≡ inner here and no filter is inferred.
    e.withColumn("__cells", sort_array(array(scored.toSeq: _*)))
      .select(col("vec_id"), posexplode_outer(ranked).as(Seq("r0", "c")))
      .select(col("vec_id"), col("c.cid").as("cell"),
        (col("r0") + 1).cast("int").as("rn"))
  }

  /** Default super-cells probed by [[cellAssignmentsTwoLevel]] — 4 of
    * ~√ncells supers keeps the flat/two-level top-1 agreement ≥ 99% on
    * the measured corpora while the dot count drops from ncells to
    * √ncells·(1 + sprobe). */
  val SuperProbe = 4

  /** Driver-side spherical k-means over the CODEBOOK's own centroids —
    * the √ncells super-cell layer that makes coarse assignment
    * sub-linear in ncells. The codebook is literal-sized by contract
    * (≤ 4096 × 64 doubles), so training runs on the driver in
    * microseconds, single-threaded and deterministic (seeds = first
    * nsuper centroids by cid; assign by max cosine, ties → lowest sid;
    * plain mean). Returns (superCentroids, cellToSuper).
    *
    * Why it exists (measured): assignment cost is ncells dots/vector,
    * and ncells scales with the corpus at fixed cell width — the
    * incremental-ANN stress residual (2.5× per 10× corpus) is exactly
    * this term, reaching 4096 dots/vector at the cell cap. Probing
    * `sprobe` supers then only their member cells costs
    * ~√ncells·(1 + sprobe) dots — O(√ncells). */
  def trainSuperCells(cents: Seq[(Long, Seq[Double], Double)],
                      nsuper0: Int = 0, iters: Int = 3): (Seq[Seq[Double]], Map[Long, Int]) = {
    if (cents.isEmpty) return (Seq.empty, Map.empty)
    val nsuper = math.min(cents.length,
      if (nsuper0 > 0) nsuper0 else math.max(1, math.round(math.sqrt(cents.length.toDouble)).toInt))
    val sorted = cents.sortBy(_._1)
    val dim = sorted.head._2.length
    // Primitive arrays + while loops throughout: the boxed-Seq form of
    // this derivation measured 90 s single-threaded at the 65536-cell
    // cap (CellCapStress r15) — pure autoboxing overhead on ~3.2 GFLOP.
    // Every accumulation below keeps the boxed form's LEFT-TO-RIGHT
    // order (dot folds ascending dims; means sum members in ascending
    // cid order; argmax scans supers ascending with strict >, keeping
    // the lowest sid on ties), so the trained centroids and the
    // membership map are bit-identical to the previous implementation —
    // the no-fork-vs-landed-artifacts law in SimilaritySpec still pins
    // this. Re-measured: 2.5 s at the cap (36x).
    val n = sorted.length
    val cvs: Array[Array[Double]] = sorted.iterator.map(_._2.toArray).toArray
    val cns: Array[Double] = sorted.iterator.map(_._3).toArray
    val cids: Array[Long] = sorted.iterator.map(_._1).toArray
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { s += a(i) * b(i); i += 1 }
      s
    }
    var supers: Array[Array[Double]] = Array.tabulate(nsuper)(j => cvs(j).clone())
    // (−cos, sid) rule, exactly the search-side tie-break
    def assignAll(ss: Array[Array[Double]]): Array[Int] = {
      val snorms = ss.map(s => math.sqrt(dot(s, s)))
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        var bestJ = 0
        var bestC = Double.NegativeInfinity
        var j = 0
        while (j < ss.length) {
          val c = if (cns(i) > 0 && snorms(j) > 0)
            dot(cvs(i), ss(j)) / (cns(i) * snorms(j)) else 0.0
          if (c > bestC) { bestC = c; bestJ = j } // strict >: ties keep lowest sid
          j += 1
        }
        out(i) = bestJ
        i += 1
      }
      out
    }
    var it = 0
    while (it < iters) {
      val assign = assignAll(supers)
      val sums = Array.fill(nsuper)(new Array[Double](dim))
      val counts = new Array[Int](nsuper)
      var i = 0
      while (i < n) {
        val j = assign(i); val v = cvs(i); val s = sums(j)
        var p = 0
        while (p < dim) { s(p) += v(p); p += 1 }
        counts(j) += 1
        i += 1
      }
      supers = Array.tabulate(nsuper) { j =>
        if (counts(j) == 0) supers(j)
        else { val s = sums(j); Array.tabulate(dim)(p => s(p) / counts(j)) }
      }
      it += 1
    }
    // the landed map must be the argmax against the FINAL centroids —
    // the membership rule the two-level assignment replays
    val fin = assignAll(supers)
    (supers.iterator.map(_.toSeq).toSeq,
      cids.iterator.zipWithIndex.map { case (cid, i) => cid -> fin(i) }.toMap)
  }

  /** The super-cell layer as its two literal-sized warehouse tables:
    * (sid, sv, snrm) and (cid, sid). */
  def superCellTables(spark: SparkSession,
                      supers: Seq[Seq[Double]],
                      cellToSuper: Map[Long, Int]): (DataFrame, DataFrame) = {
    import spark.implicits._
    val sc = supers.zipWithIndex
      .map { case (s, j) => (j.toLong, s, math.sqrt(s.map(x => x * x).sum)) }
      .toDF("sid", "sv", "snrm")
    val mp = cellToSuper.toSeq.sortBy(_._1)
      .map { case (cid, sid) => (cid, sid.toLong) }.toDF("cid", "sid")
    (sc, mp)
  }

  /** TWO-LEVEL coarse assignment: rank `sprobe` super-cells per vector
    * (√ncells literal dots, map-only), then score ONLY the cells mapped
    * to those supers (broadcast join against the codebook-sized
    * (sid, cid, cv, cnrm) table) and keep the best (bounded top-k
    * aggregate — never a per-vector rank window). Output
    * (vec_id, cell, cos_micro), one row per vector.
    *
    * Semantics vs the flat [[cellAssignments]]: EXACT when sprobe ≥
    * nsuper (every cell is scored — SimilaritySpec pins row equality);
    * at the default [[SuperProbe]] a vector whose true nearest cell
    * lives in an unprobed super may assign to its second-best cell —
    * the standard hierarchical-IVF trade (measured agreement on the
    * test corpora in SimilaritySpec; the cell-occupancy consequences
    * are the q143 monitor's job). Tie-breaks replay the flat rule:
    * supers by (−cos, sid), cells by (−cos, cid). */
  def cellAssignmentsTwoLevel(embeddings: DataFrame, codebook: DataFrame,
                              supercells: DataFrame, superMap: DataFrame,
                              sprobe: Int = SuperProbe): DataFrame = {
    val cand = twoLevelCellCandidates(prepared(embeddings), codebook,
      supercells, superMap, sprobe)
    if (cand.isEmpty)
      return embeddings.sparkSession.range(0).select(col("id").as("vec_id"),
        col("id").as("cell"), col("id").as("cos_micro"))
    topK(cand.get, 1)
      .select(col("qid").as("vec_id"), col("nid").as("cell"),
        expr("CAST(floor(cosine * 1000000.0) AS BIGINT)").as("cos_micro"))
      .orderBy("vec_id")
  }

  /** Shared two-level candidate stage over an already-[[prepared]]
    * frame `e` (callers pass their leased frame so the norm pass runs
    * once — r13 ADVICE): (qid, nid = candidate cell id, cosine) —
    * `sprobe` super-ranks per vector (√ncells literal dots, map-only)
    * joined to the probed supers' member cells (broadcast,
    * codebook-sized). None when the super layer is empty. Tie-breaks
    * replay the flat rule downstream: [[topK]] ranks (cosine DESC,
    * nid), exactly the oracle's `ORDER BY cos DESC, cid`. */
  private def twoLevelCellCandidates(e: DataFrame, codebook: DataFrame,
                                     supercells: DataFrame, superMap: DataFrame,
                                     sprobe: Int): Option[DataFrame] = {
    require(sprobe >= 1, "sprobe must be positive")
    val supers = collectCodebook(
      supercells.select(col("sid").as("cid"), col("sv").as("cv"), col("snrm").as("cnrm")))
    if (supers.isEmpty) return None
    val scored = supers.map { case (sid, sv, sn) =>
      struct((-(dotCol(typedLit(sv.toSeq), col("v")) / (col("nrm") * lit(sn)))).as("nscos"),
        lit(sid).as("sid"))
    }
    val probed = e
      .withColumn("__supers", sort_array(array(scored.toSeq: _*)))
      .select(col("vec_id"), col("v"), col("nrm"),
        explode_outer(expr(s"slice(__supers, 1, $sprobe)")).as("__s"))
      .select(col("vec_id"), col("v"), col("nrm"), col("__s.sid").as("sid"))
    val cells = superMap.join(codebook.select(col("cid"), col("cv"), col("cnrm")), Seq("cid"))
      .select(col("sid"), col("cid"), col("cv"), col("cnrm"))
    Some(probed.join(broadcast(cells), Seq("sid"))
      .select(col("vec_id").as("qid"), col("cid").as("nid"),
        (dotCol(col("cv"), col("v")) / (col("nrm") * col("cnrm"))).as("cosine")))
  }

  /** Top-`probes` cell ranking under the TWO-LEVEL rule — the probe-set
    * builder for [[annIvfNewAgainstAssignedTwoLevel]]: (vec_id, cell,
    * rn ≤ probes), cells drawn only from the vector's top-`sprobe`
    * supers. rn = 1 equals [[cellAssignmentsTwoLevel]]'s cell by
    * construction (same candidates, same tie-break). */
  def cellRankTwoLevel(embeddings: DataFrame, codebook: DataFrame,
                       supercells: DataFrame, superMap: DataFrame,
                       probes: Int, sprobe: Int = SuperProbe): DataFrame =
    cellRankTwoLevelPrepared(prepared(embeddings), codebook, supercells,
      superMap, probes, sprobe)

  private def cellRankTwoLevelPrepared(e: DataFrame, codebook: DataFrame,
                                       supercells: DataFrame, superMap: DataFrame,
                                       probes: Int, sprobe: Int): DataFrame = {
    require(probes >= 1, "probes must be positive")
    val cand = twoLevelCellCandidates(e, codebook, supercells, superMap, sprobe)
    if (cand.isEmpty)
      return e.sparkSession.range(0).select(col("id").as("vec_id"),
        col("id").as("cell"), col("id").cast("int").as("rn"))
    topK(cand.get, probes)
      .select(col("qid").as("vec_id"), col("nid").as("cell"),
        col("rank").cast("int").as("rn"))
  }

  /** Codebook size at which the PRODUCTION assignment rule switches
    * from flat literal ranking to the two-level super-cell path.
    * Measured (BASELINE.md r13 stress): at 39 cells the super layer
    * costs more than it saves (0.79 s vs 0.51 s flat); at 390 cells it
    * is 2.7× faster (2.24 s vs 5.99 s) and the gap widens with ncells —
    * the crossover sits in the 64–128 band, and the flat side of it is
    * chosen so the test SFs (≤ 39 cells) keep the cheaper plan. The
    * DuckDB oracles replay the SAME selector (branch on the codebook's
    * row count), so the hash gate stays exact on either side. */
  val IvfTwoLevelCrossover = 128

  /** The PRODUCTION cell-ranking rule (one rule everywhere — warehouse
    * build, incremental ANN batches, drift monitors, streaming
    * maintenance): flat literal ranking while the codebook holds ≤
    * `crossover` cells, two-level super-cell ranking above it (ncells
    * dots/vector vs ~√ncells·(1 + sprobe) — the term that made flat
    * assignment scale with the corpus). Output (vec_id, cell,
    * rn ≤ probes) on both sides of the switch.
    *
    * `supercells`/`superMap`: pass the LANDED warehouse artifacts where
    * they exist; when absent (streaming maintenance before first
    * build), the driver-side [[trainSuperCells]] twin derivation is
    * used — deterministic from the codebook, so it CANNOT fork from
    * the landed tables ([[graft.warehouse.Warehouse.buildIvfSuperCells]]
    * derives the same way). Derivation only runs when the two-level
    * branch is actually selected. */
  def cellRankAuto(embeddings: DataFrame, codebook: DataFrame, probes: Int,
                   supercells: Option[DataFrame] = None,
                   superMap: Option[DataFrame] = None,
                   sprobe: Int = SuperProbe,
                   crossover: Int = IvfTwoLevelCrossover): DataFrame =
    cellRankAutoPrepared(prepared(embeddings), codebook, probes, supercells,
      superMap, sprobe, crossover)

  private def cellRankAutoPrepared(e: DataFrame, codebook: DataFrame, probes: Int,
                                   supercells: Option[DataFrame],
                                   superMap: Option[DataFrame],
                                   sprobe: Int, crossover: Int): DataFrame = {
    // ONE codebook collect per call (r14 ADVICE): the selector's cents
    // array threads into whichever branch runs instead of the flat
    // branch re-collecting — at the 65536-cell cap a second collect is
    // a second ~33 MB driver pull per query.
    val cents = collectCodebook(codebook)
    if (cents.length <= crossover) cellAssignmentsPrepared(e, cents, maxRank = probes)
    else {
      val (sc, mp) = supersFor(e.sparkSession, cents, supercells, superMap)
      cellRankTwoLevelPrepared(e, codebook, sc, mp, probes, sprobe)
    }
  }

  /** The super-cell pair for the two-level branch: the landed artifacts
    * when supplied, else the deterministic driver-side twin derivation
    * from the collected codebook. */
  private def supersFor(spark: SparkSession,
                        cents: Array[(Long, Seq[Double], Double)],
                        supercells: Option[DataFrame],
                        superMap: Option[DataFrame]): (DataFrame, DataFrame) = {
    // a half-supplied artifact pair is a caller wiring bug (wrong slot,
    // one artifact dropped) — fail loudly instead of silently deriving
    // both and masking it (derivation is deterministic, so results
    // would stay correct today and the bug would never surface)
    require(supercells.isDefined == superMap.isDefined,
      s"supercells and superMap must be supplied together: " +
        s"supercells=${supercells.isDefined}, superMap=${superMap.isDefined}")
    (supercells, superMap) match {
      case (Some(sc), Some(mp)) => (sc, mp)
      case _ =>
        val (supers, m) = trainSuperCells(cents.toSeq)
        superCellTables(spark, supers, m)
    }
  }

  /** rn = 1 assignment under the selector rule WITH the prepared vector
    * carried: (vec_id, label, v, nrm, cell). The flat branch stays MAP-ONLY
    * (`__cells[0]` on the scored array — no rank explode, no join); the
    * two-level branch pays its inherent top-1 aggregate plus a vec_id
    * join back to the prepared frame (leased here — it feeds the
    * ranking and the attach). */
  private def cellAssignWithVec(e: DataFrame, codebook: DataFrame,
                                supercells: Option[DataFrame],
                                superMap: Option[DataFrame],
                                sprobe: Int = SuperProbe,
                                crossover: Int = IvfTwoLevelCrossover): DataFrame = {
    val cents = collectCodebook(codebook)
    if (cents.length <= crossover) withCells(e, cents)
      .select(col("vec_id"), col("label"), col("v"), col("nrm"),
        expr("__cells[0].cid").as("cell"))
    else {
      val (sc, mp) = supersFor(e.sparkSession, cents, supercells, superMap)
      val el = e.leased
      cellRankTwoLevelPrepared(el, codebook, sc, mp, probes = 1, sprobe = sprobe)
        .select(col("vec_id"), col("cell"))
        .join(el, Seq("vec_id"))
        .select(col("vec_id"), col("label"), col("v"), col("nrm"), col("cell"))
    }
  }

  /** [[annIvfNewAgainstAssigned]] with the BATCH probe ranked through
    * the two-level super-cell layer — the production incremental-ANN
    * form once ncells outgrows the flat scan: per-batch assignment cost
    * drops from ncells dots/vector to ~√ncells·(1 + sprobe) (4096 → ~320
    * at the cell cap), while the corpus side still reads the landed
    * `ivf_assign` artifact untouched. Probe semantics: the top-`nprobe`
    * cells are drawn from the batch vector's top-`sprobe` supers — EXACT
    * vs the flat probe when sprobe ≥ nsuper (spec-pinned row equality);
    * at the default [[SuperProbe]] a true probe cell in an unprobed
    * super is the standard hierarchical-IVF recall trade, and the
    * oracle replays the SAME two-level rule from the landed supercell
    * artifacts, so the hash gate stays exact at every sprobe. */
  def annIvfNewAgainstAssignedTwoLevel(newVecs: DataFrame, corpus: DataFrame,
                                       assign: DataFrame, codebook: DataFrame,
                                       supercells: DataFrame, superMap: DataFrame,
                                       k: Int = 3, nprobe: Int = 6,
                                       sprobe: Int = SuperProbe): DataFrame = {
    require(nprobe >= 1, "nprobe must be positive")
    // ONE prepared pass: the leased frame feeds both the super-ranking
    // and the probe-side vector attach (r13 ADVICE — the candidate
    // stage used to re-prepare internally and persist a frame used once)
    val e = prepared(newVecs).leased
    val probeCells =
      cellRankTwoLevelPrepared(e, codebook, supercells, superMap, nprobe, sprobe)
    val q = probeCells.join(e, Seq("vec_id"))
      .select(col("vec_id").as("qid"), col("v").as("va"), col("nrm").as("na"), col("cell"))
    val n = assign.where(col("rn") === 1).select(col("vec_id"), col("cell"))
      .join(prepared(corpus), Seq("vec_id"))
      .select(col("vec_id").as("nid"), col("v").as("vb"), col("nrm").as("nb"), col("cell"))
    probeAgainstIndexed(q, n, k, excludeSelf = false)
  }

  /** Incremental ANN under the PRODUCTION selector ([[cellRankAuto]]'s
    * rule applied to the batch probe): flat probe ranking while the
    * codebook holds ≤ `crossover` cells, two-level above — one
    * assignment rule everywhere, so the batch probes exactly the cells
    * the landed `ivf_assign` artifact was built with. The corpus side
    * reads the artifact's rn = 1 rows on both branches. */
  def annIvfNewAgainstAssignedAuto(newVecs: DataFrame, corpus: DataFrame,
                                   assign: DataFrame, codebook: DataFrame,
                                   supercells: Option[DataFrame] = None,
                                   superMap: Option[DataFrame] = None,
                                   k: Int = 3, nprobe: Int = 6,
                                   sprobe: Int = SuperProbe,
                                   crossover: Int = IvfTwoLevelCrossover): DataFrame = {
    // selector collects the codebook ONCE; both branches consume the
    // same cents array (r14 ADVICE — the flat branch used to re-collect)
    val cents = collectCodebook(codebook)
    if (cents.length <= crossover)
      annIvfNewAgainstAssignedFlat(newVecs, corpus, assign, cents, k, nprobe)
    else {
      val (sc, mp) = supersFor(newVecs.sparkSession, cents, supercells, superMap)
      annIvfNewAgainstAssignedTwoLevel(newVecs, corpus, assign, codebook, sc, mp,
        k, nprobe, sprobe)
    }
  }

  /** IVF search over a MATERIALIZED cell assignment ([[cellAssignments]]
    * read back from the warehouse): probe side = each query's rn ≤
    * nprobe cells, index side = each vector's rn = 1 cell. Equivalent to
    * [[annIvfWithCodebook]] by construction, but the per-query plan pays
    * two joins against a three-int-column parquet instead of re-scoring
    * ncells literal centroids per vector — at a billion vectors the
    * assignment is computed once per corpus build, not once per query. */
  def annIvfWithAssign(embeddings: DataFrame, assign: DataFrame,
                       k: Int = 3, nprobe: Int = 6): DataFrame = {
    val e = prepared(embeddings).leased
    val q = assign.where(col("rn") <= nprobe).select(col("vec_id"), col("cell"))
      .join(e, Seq("vec_id"))
      .select(col("vec_id").as("qid"), col("cell"), col("v").as("va"), col("nrm").as("na"))
    val n = assign.where(col("rn") === 1).select(col("vec_id"), col("cell"))
      .join(e, Seq("vec_id"))
      .select(col("vec_id").as("nid"), col("cell"), col("v").as("vb"), col("nrm").as("nb"))
    // the pair join keys on `cell` alone — ncells distinct values, so an
    // unsalted shuffle caps the pair-evaluation (and top-k partial-agg)
    // parallelism at ncells tasks regardless of cluster width. Salt the
    // probe side so each cell fans out over CellSalt buckets; the index
    // side replicates ×CellSalt (bounded: the index is one row per
    // corpus vector, and the dot-product work it feeds is ~N²/ncells).
    val pairs = graft.operators.SkewJoin.salted(q, n, Seq("cell"), CellSalt)
      .where(col("qid") =!= col("nid"))
      .withColumn("cosine", dotExpr("va", "vb") / (col("na") * col("nb")))
    topK(pairs, k)
  }

  /** Salt-bucket fanout for IVF cell joins: cells are few (8–64) by
    * design, so cell-keyed joins under-parallelize any cluster wider
    * than ncells; ncells × CellSalt shuffle keys restore full width.
    * Correctness is salt-invariant (SkewJoinSpec pins row equality). */
  val CellSalt = 8

  /** [[annLsh]]'s salt — wider than [[CellSalt]] because hyperplane
    * bucket occupancy has no width bound (IVF cells are ~512-wide by
    * construction; an LSH mega-bucket on a clustered corpus held ~25%
    * of sf10's vectors): the hottest bucket's pair mass splits n_b²/64
    * per task, and the replicated side stays one row per corpus
    * vector. Salt-invariance is the same SkewJoinSpec law. */
  val LshSalt = 64

  /** Deterministic spherical k-means for IVF coarse quantization.
    * Init = first `ncells` vectors by id; each Lloyd iteration assigns
    * every vector to its max-cosine centroid (ties → lowest cell id) and
    * recomputes cell means with DECIMAL sums, so the result is
    * independent of partitioning/summation order — the same corpus
    * always trains the same codebook. The collected state is the
    * centroid matrix itself (ncells × dim — literal-sized by
    * construction, exactly what a production pipeline broadcasts);
    * per-vector work stays distributed. */
  def trainIvfCentroids(embeddings: DataFrame, ncells: Int = 8, iters: Int = 3,
                        sampleMod: Int = 4): Seq[Seq[Double]] = {
    val e = prepared(embeddings).persist()
    try trainFromPrepared(e, ncells, iters, sampleMod) finally e.unpersist()
  }

  /** `sampleMod` trains on the deterministic 1/sampleMod subsample
    * `vec_id % sampleMod == 0` — a coarse quantizer needs cluster
    * CENTERS, not every point, and at billion-vector scale k-means is
    * always trained on a sample (measured here: recall within noise of
    * full-corpus training at 4× less per-iteration work). */
  private def trainFromPrepared(e: DataFrame, ncells: Int, iters: Int,
                                sampleMod: Int): Seq[Seq[Double]] = {
    def seeds(df: DataFrame): Seq[Seq[Double]] = df.orderBy("vec_id").limit(ncells)
      .select(col("v")).collect().map(_.getSeq[Double](0).toSeq).toSeq
    val sampled = (if (sampleMod > 1) e.where(pmod(col("vec_id"), lit(sampleMod)) === 0) else e)
      .select(col("vec_id"), col("v"), col("nrm")).persist()
    // A sample thinner than the codebook can't seed ncells centroids —
    // fall back to the full table, and if even that is thinner, train
    // the smaller codebook it CAN support (k = rows; empty input → no
    // codebook, the search then returns no pairs).
    var cents = seeds(sampled)
    val sample =
      if (cents.length < ncells && sampleMod > 1) {
        sampled.unpersist()
        val full = e.select(col("vec_id"), col("v"), col("nrm")).persist()
        cents = seeds(full)
        full
      } else sampled
    if (cents.isEmpty) { sample.unpersist(); return Seq.empty }
    val k = cents.length
    val dim = cents.head.length
    for (_ <- 1 to iters) {
      val cos = cents.map { c =>
        val cn = math.sqrt(c.map(x => x * x).sum)
        dotCol(typedLit(c), col("v")) / (col("nrm") * lit(cn))
      }
      // argmax with first-wins tie-break: array_position finds the FIRST
      // element equal to the max → lowest cell id.
      val assigned = sample.withColumn("cosarr", array(cos: _*))
        .withColumn("cell",
          (expr("array_position(cosarr, array_max(cosarr))") - 1).cast("int"))
      val sums = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x").cast("decimal(30,15)")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = Array.tabulate(k, dim)((c, p) => cents(c)(p)) // empty cell keeps its centroid
      sums.foreach { r =>
        next(r.getAs[Int]("cell"))(r.getAs[Int]("pos")) =
          r.getAs[java.math.BigDecimal]("s").doubleValue() / r.getAs[Long]("n")
      }
      cents = next.map(_.toSeq).toSeq
    }
    sample.unpersist()
    cents
  }

  /** Shared IVF search core: coarse-assign every vector against the
    * codebook, then exact top-k within the probe's top-`nprobe` cells
    * against the single-cell index side.
    *
    * The codebook is LITERAL-SIZED by contract (ncells × dim — the
    * artifact a production system broadcasts), so assignment embeds the
    * centroids as plan literals and ranks cells with one map-side
    * array sort per vector: sort_array over (−ccos, cid) structs, top
    * element = the vector's own cell, top nprobe = its probe set. The
    * round-5 shape (crossJoin against the codebook table + a
    * row_number window over vec_id) inflated the stream ×ncells and
    * paid a full shuffle just to rank 16 numbers per row — at a
    * billion vectors that window IS the query's dominant shuffle.
    * Tie-break matches the oracle's `ORDER BY ccos DESC, cid`:
    * negation reverses the double order exactly, struct sort then
    * breaks ties on the ascending cid. */
  private def ivfSearch(e: DataFrame, cent: DataFrame, k: Int, nprobe: Int): DataFrame =
    ivfSearchCore(e, e, cent, k, nprobe, excludeSelf = true)

  /** Incremental ANN: search a NEW batch of vectors against the
    * EXISTING corpus under the trained codebook — probe side = the new
    * vectors' top-nprobe cells, index side = the corpus in its cells
    * (a materialized artifact in production). The corpus×corpus search
    * never re-runs: per-batch cost scales with the batch. The daily
    * retrieval-index update shape at 100 TB. */
  def annIvfNewAgainstCorpus(newVecs: DataFrame, corpus: DataFrame, codebook: DataFrame,
                             k: Int = 3, nprobe: Int = 6): DataFrame =
    ivfSearchCore(prepared(newVecs).persist(), prepared(corpus).persist(),
      codebook.select(col("cid"), col("cv"), col("cnrm")), k, nprobe,
      excludeSelf = false)

  /** Bipartite IVF search core (see [[ivfSearch]] for the map-only
    * assignment rationale): `eQ` probes its top-`nprobe` cells against
    * `eN` indexed in each vector's single nearest cell. `excludeSelf`
    * drops qid = nid pairs for the self-search case. */
  private def ivfSearchCore(eQ: DataFrame, eN: DataFrame, cent: DataFrame,
                            k: Int, nprobe: Int, excludeSelf: Boolean): DataFrame = {
    // argument validation BEFORE data inspection, matching
    // [[graft.vector.ProductQuant.annIvfPq]]: an empty corpus with
    // nprobe = 0 throws on both paths instead of one returning empty
    require(nprobe >= 1, "nprobe must be positive")
    val cents = collectCodebook(cent)
    if (cents.isEmpty) // empty codebook (empty corpus) → no pairs, same schema
      return emptyRanked(eQ.sparkSession)
    val n = withCells(eN, cents).select(col("vec_id").as("nid"), col("v").as("vb"),
      col("nrm").as("nb"), expr("__cells[0].cid").as("cell"))
    probeAgainstIndexed(probeSide(eQ, cents, nprobe), n, k, excludeSelf)
  }

  private[graft] def collectCodebook(cent: DataFrame): Array[(Long, Seq[Double], Double)] =
    cent.select(col("cid"), col("cv"), col("cnrm")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))

  private def emptyRanked(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("qid"),
      col("id").cast("int").as("rank"), col("id").as("nid"),
      col("id").cast("double").as("cosine"))

  /** (−cosine, cid) struct-sorted cell ranking as a `__cells` column —
    * the shared scoring projection of every literal-codebook path.
    * Downstream explode/`__cells[0]` access stays OUTER-safe: the plain
    * generator's inferred `size(slice(...)) > 0` filter re-evaluates
    * the whole ncells-literal sort per row (2× the assignment work even
    * when pushdown stops at a cached input — the cellAssignments
    * finding). slice(non-empty, 1, ≥1) is statically non-empty, so
    * outer ≡ inner. */
  private def withCells(e: DataFrame, cents: Array[(Long, Seq[Double], Double)]): DataFrame = {
    val scored = cents.map { case (cid, cv, cn) =>
      struct((-(dotCol(typedLit(cv.toSeq), col("v")) / (col("nrm") * lit(cn)))).as("nccos"),
        lit(cid).as("cid"))
    }
    e.withColumn("__cells", sort_array(array(scored.toSeq: _*)))
  }

  /** Probe rows (qid, va, na, cell) — one row per (query, probe cell). */
  private def probeSide(eQ: DataFrame, cents: Array[(Long, Seq[Double], Double)],
                        nprobe: Int): DataFrame =
    withCells(eQ, cents).select(col("vec_id").as("qid"), col("v").as("va"),
        col("nrm").as("na"), explode_outer(expr(s"slice(__cells, 1, $nprobe)")).as("__pc"))
      .select(col("qid"), col("va"), col("na"), col("__pc.cid").as("cell"))

  /** In-cell candidate join + top-k over a probe side (qid, va, na,
    * cell) and an indexed side (nid, vb, nb, cell). Each (qid, nid)
    * pair appears at most once: the index assignment is unique and the
    * probe cells are distinct. Salted for the same reason as
    * [[annIvfWithAssign]]: ncells join keys alone would cap the
    * pair-evaluation (and top-k partial-agg) parallelism at ncells
    * tasks. */
  private def probeAgainstIndexed(q: DataFrame, n: DataFrame, k: Int,
                                  excludeSelf: Boolean): DataFrame = {
    val joined = graft.operators.SkewJoin.salted(q, n, Seq("cell"), CellSalt)
    val pairs = (if (excludeSelf) joined.where(col("qid") =!= col("nid")) else joined)
      .withColumn("cosine", dotExpr("va", "vb") / (col("na") * col("nb")))
    topK(pairs, k)
  }

  /** Incremental ANN against the MATERIALIZED corpus assignment — the
    * production form of [[annIvfNewAgainstCorpus]]: the corpus side
    * joins the landed `ivf_assign` artifact's rn = 1 rows instead of
    * re-scoring ncells centroid literals over the whole corpus per
    * arriving batch. Per-batch cost = batch-sized cell assignment + the
    * in-cell candidate join; the corpus-sized assignment is paid once
    * per corpus build (graft.warehouse.Warehouse), not once per batch.
    * Equivalent to [[annIvfNewAgainstCorpus]] by construction when
    * `assign` was built from the same `codebook` (cell ranking and
    * tie-break are identical — SimilaritySpec pins row equality).
    * `assign` rows for vectors absent from `corpus` drop in the join,
    * so callers may pass the full-corpus artifact beside a filtered
    * corpus side. */
  def annIvfNewAgainstAssigned(newVecs: DataFrame, corpus: DataFrame,
                               assign: DataFrame, codebook: DataFrame,
                               k: Int = 3, nprobe: Int = 6): DataFrame =
    annIvfNewAgainstAssignedFlat(newVecs, corpus, assign,
      collectCodebook(codebook), k, nprobe)

  private def annIvfNewAgainstAssignedFlat(
      newVecs: DataFrame, corpus: DataFrame, assign: DataFrame,
      cents: Array[(Long, Seq[Double], Double)],
      k: Int, nprobe: Int): DataFrame = {
    require(nprobe >= 1, "nprobe must be positive")
    if (cents.isEmpty)
      return emptyRanked(newVecs.sparkSession)
    val n = assign.where(col("rn") === 1).select(col("vec_id"), col("cell"))
      .join(prepared(corpus), Seq("vec_id"))
      .select(col("vec_id").as("nid"), col("v").as("vb"), col("nrm").as("nb"), col("cell"))
    probeAgainstIndexed(probeSide(prepared(newVecs), cents, nprobe), n, k,
      excludeSelf = false)
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009) — the standard
    * ensemble trick for hybrid retrieval: each ranked list contributes
    * 1/(c + rank) per hit, summed per (qid, nid); items surfaced by
    * several retrievers with decent ranks beat items one retriever
    * ranked first. Scores are integer micros (10^6 div (c + rank)) so
    * fusion is exact and oracle-replayable. Input lists carry
    * (qid, rank, nid); output is the fused top-`k`:
    * (qid, rank, nid, rrf_micro).
    *
    * Scale posture: fusion touches only the retrievers' TOP-K LISTS
    * (≤ Σk rows per query — bounded state), never the corpora; the one
    * shuffle keys on (qid, nid) over those bounded lists, then the
    * bounded top-k aggregate emits the fused ranking. */
  def rrfFuse(lists: Seq[DataFrame], k: Int = 3, c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    val all = lists.map(_.select(col("qid"), col("rank"), col("nid"))).reduce(_ unionByName _)
    val fused = all
      .groupBy(col("qid"), col("nid"))
      .agg(sum(expr(s"1000000L div ($c + rank)")).as("rrf_micro"))
      // exact in double (micros ≤ 10^6·lists), so the bounded top-k
      // aggregate replaces a per-query rank window; ties → lowest nid,
      // matching the oracle's ORDER BY rrf DESC, nid
      .select(col("qid"), col("nid"), col("rrf_micro").cast("double").as("score"))
    fused.groupBy(col("qid")).agg(expr(s"top_k_pairs(nid, score, $k)").as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("r0", "p")))
      .select(col("qid"), (col("r0") + 1).cast("long").as("rank"),
        col("p.id").as("nid"), col("p.score").cast("long").as("rrf_micro"))
      .orderBy("qid", "rank")
  }

  /** Exact GLOBAL top-k for a deterministic hash-sample of queries —
    * the recall-eval protocol that scales: label-blocked exact kNN
    * (q17) truncates ground truth to the block, while full global
    * brute force is N² and dies at corpus scale. Sampling queries
    * (md5-hash rule, stable under id re-assignment) bounds the cost at
    * |sample| × N dots with the SAMPLE broadcast and the corpus
    * streamed past it — one scan, no shuffle of the big side, the
    * shape you'd run on 1000 executors. Output: (qid, rank, nid,
    * cosine) for sampled qids only. */
  def knnGlobalSampled(embeddings: DataFrame, sampleMod: Int = 50,
                       k: Int = 3): DataFrame = {
    require(sampleMod >= 1 && k >= 1)
    val e = prepared(embeddings)
    val q = e.where(pmod(graft.functions.PortableHash.h60(col("vec_id").cast("string")),
        lit(sampleMod.toLong)) === 0)
      .select(col("vec_id").as("qid"), col("v").as("va"), col("nrm").as("na"))
    val n = e.select(col("vec_id").as("nid"), col("v").as("vb"), col("nrm").as("nb"))
    val pairs = n.crossJoin(broadcast(q)).where(col("qid") =!= col("nid"))
      .withColumn("cosine", dotExpr("va", "vb") / (col("na") * col("nb")))
    topK(pairs, k)
  }

  /** Retrieve-then-rerank — the cross-encoder serving shape: a cheap
    * index proposes a short candidate list per query, an expensive
    * EXACT scorer re-orders only that list (here: full-vector cosine;
    * in production the stand-in for a cross-encoder forward pass).
    * Input `candidates` carries (qid, nid, rank) — any retriever's or
    * fusion's top-k; output one row per candidate with the retrieval
    * rank, the re-ranked rank, the exact score in floor-micros, and a
    * `moved` flag marking where the expensive stage changed the order.
    *
    * Scale posture: the exact scorer touches ONLY |candidates| pairs
    * (k per query — bounded state), never a corpus cross product; the
    * two vector joins key on qid/nid, and the rank window partitions
    * per qid over ≤ k rows — bounded by construction, the one window
    * shape that survives any corpus size. */
  def rerankExact(embeddings: DataFrame, candidates: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = prepared(embeddings)
    val q = e.select(col("vec_id").as("qid"), col("v").as("va"), col("nrm").as("na"))
    val n = e.select(col("vec_id").as("nid"), col("v").as("vb"), col("nrm").as("nb"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    candidates.select(col("qid"), col("nid"), col("rank").as("retr_rank"))
      .join(q, Seq("qid")).join(n, Seq("nid"))
      .withColumn("cosine", dotExpr("va", "vb") / (col("na") * col("nb")))
      .withColumn("rr_rank", row_number().over(w).cast("long"))
      .select(col("qid"), col("nid"), col("retr_rank"), col("rr_rank"),
        expr("CAST(floor(cosine * 1000000.0) AS BIGINT)").as("cos_micro"),
        (col("rr_rank") =!= col("retr_rank")).cast("int").as("moved"))
      .orderBy("qid", "rr_rank")
  }

  /** SemDeDup — semantic deduplication via the trained coarse quantizer
    * (Abbas et al., arXiv:2303.09540: cluster the embedding space, drop
    * near-identical vectors WITHIN a cluster, keep one canonical per
    * duplicate relation). Each vector is assigned to its single nearest
    * codebook cell under the PRODUCTION selector rule ([[cellRankAuto]]:
    * map-only literal sort_array below [[IvfTwoLevelCrossover]] cells,
    * two-level super-cell ranking above it); within a cell,
    * pairs with cosine ≥ `threshold` mark the HIGHER vec_id as dropped.
    * Output, one row per dropped vector: its lowest-id in-cell witness,
    * that witness pair's cosine, and the witness count.
    *
    * Scale: this is the dedup twin of IVF search — candidate pairs
    * exist only inside a cell, so the quadratic blowup is bounded by
    * the largest cell, not the corpus; the codebook is the build-once
    * warehouse artifact, broadcast as plan literals. Cross-cell near
    * dups at the cell boundary are the accepted SemDeDup trade-off
    * (recall rises with finer codebooks, cost falls — the ncells knob). */
  def semanticDedup(embeddings: DataFrame, codebook: DataFrame,
                    threshold: Double = 0.4,
                    supercells: Option[DataFrame] = None,
                    superMap: Option[DataFrame] = None): DataFrame = {
    val cents = collectCodebook(codebook)
    val e = prepared(embeddings)
    if (cents.isEmpty) // empty codebook (empty corpus) → nothing to drop
      return e.sparkSession.range(0).select(col("id").as("dropped"),
        col("id").as("witness"), col("id").cast("double").as("witness_cosine"),
        col("id").as("n_witnesses"))
    // assignment under the PRODUCTION selector (flat ≤ crossover cells,
    // two-level above — the one rule every consumer shares); the flat
    // branch stays map-only ([[cellAssignWithVec]])
    val cells = cellAssignWithVec(e, codebook, supercells, superMap)
      .leased // probed by both sides of the in-cell self-join
    val a = cells.select(col("vec_id").as("vec_a"), col("v").as("va"),
      col("nrm").as("na"), col("cell"))
    val b = cells.select(col("vec_id").as("vec_b"), col("v").as("vb"),
      col("nrm").as("nb"), col("cell"))
    a.join(b, Seq("cell")).where(col("vec_a") < col("vec_b"))
      .withColumn("cosine", dotExpr("va", "vb") / (col("na") * col("nb")))
      .where(col("cosine") >= lit(threshold))
      .groupBy(col("vec_b").as("dropped"))
      .agg(min(col("vec_a")).as("witness"),
        min_by(col("cosine"), col("vec_a")).as("witness_cosine"),
        count(lit(1)).as("n_witnesses"))
      .orderBy("dropped")
  }

  /** Per-label centroid outliers — label-noise detection: each label's
    * centroid is a FIXED-POINT integer mean (per coordinate,
    * floor((x+1)·2²⁰) summed as BIGINT, one floor-division by n), so the
    * centroid is bit-identical on any engine and any summation order —
    * no decimal rounding-mode coupling, no float accumulation. The 2⁻²⁰
    * quantization (±1 ulp at the 6th decimal) is noise relative to the
    * centroid's own sampling error. The `+1` offset keeps sums
    * nonnegative (inputs are unit-scale, |x| < 1), making truncating
    * and flooring division agree across engines; it is subtracted back
    * after the divide. The k vectors LEAST cosine-similar to their own
    * label's centroid are flagged (ties → lowest vec_id) via the
    * bounded top-k aggregate on the negated score — never a per-label
    * sort window.
    *
    * Scale: one (label, pos) aggregate (map-side combine) builds the
    * centroid table — label-count × dim rows, broadcast back; scoring
    * is a pure map stage; the flag is k rows of aggregate state per
    * label. */
  def labelOutliers(embeddings: DataFrame, k: Int = 3): DataFrame = {
    require(k > 0)
    val e = prepared(embeddings).leased
    val fix = e.select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(floor((col("x") + 1) * lit(1048576L)).cast("long")).as("s"),
        count(lit(1)).as("n"))
    val cent = fix
      .withColumn("c", expr("s div n").cast("double") / lit(1048576.0) - 1)
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), p -> p.c)").as("cv"))
      .withColumn("cnrm", sqrt(dotExpr("cv", "cv")))
    e.join(broadcast(cent), Seq("label"))
      .withColumn("cosine", dotExpr("v", "cv") / (col("nrm") * col("cnrm")))
      .select(col("label").cast("long").as("qid"), col("vec_id").as("nid"),
        (-col("cosine")).as("cosine"))
      .groupBy(col("qid")).agg(expr(s"top_k_pairs(nid, cosine, $k)").as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("r0", "p")))
      .select(col("qid").cast("int").as("label"), (col("r0") + 1).as("rank"),
        col("p.id").as("vec_id"), (-col("p.score")).as("cosine"))
      .orderBy("label", "rank")
  }

  /** Per-label EMBEDDING-DISTRIBUTION drift — the semantic companion
    * to the cell-occupancy monitor (q143): a source can keep its IVF
    * cell histogram while its meaning MOVES WITHIN cells, and this is
    * the monitor that sees it. For each label, the landed corpus's
    * centroid vs the arriving batch's, reported as the centroid-pair
    * cosine in integer micros plus the label-share shift in ppm; a
    * falling cos_micro on a stable share is within-cell semantic
    * drift, a share shift with stable cosine is mixture drift.
    *
    * Centroids use the [[labelOutliers]] fixed-point rule
    * (floor((x+1)·2²⁰) summed as BIGINT, one floor-division by n) so
    * each centroid is bit-identical on any engine and any summation
    * order; the cosine of two exactly-agreed double arrays is the
    * sequential [[graft.functions.VecDot]] fold both engines share,
    * floored to micros. Labels enumerate from BOTH sides so a label
    * present in only one reports — cos_micro is then the −2,000,000
    * sentinel (below the [−10⁶, 10⁶] cosine range: "no measurement",
    * never "orthogonal").
    *
    * Scale: two (label, pos) map-side-combined aggregates (state =
    * labels × dim cells), one label-keyed join of label-cardinality
    * tables, two 1-row broadcast totals. The corpus side reads the
    * corpus once; nothing pairs. */
  def centroidDrift(corpus: DataFrame, batch: DataFrame): DataFrame =
    centroidDriftFromSums(labelCentroidSums(corpus), batch)

  /** Fixed-point per-label centroid SUM state (label, pos, s, n) — the
    * MERGEABLE form of the corpus-centroid artifact (warehouse
    * `label_centroid_sums_base`): sums and counts merge under appends
    * by keyed addition (WarehouseMaintenanceSpec pins the law), so the
    * drift monitor's corpus side is maintained state, never a per-batch
    * corpus re-aggregation. Fixed-point rule as [[labelOutliers]]:
    * floor((x+1)·2²⁰) summed as BIGINT — bit-identical on any engine
    * and summation order. */
  def labelCentroidSums(e: DataFrame): DataFrame =
    prepared(e).select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(floor((col("x") + 1) * lit(1048576L)).cast("long")).as("s"),
        count(lit(1)).as("n"))

  /** (label, cv, n) centroids from the sum state — one floor-division
    * per coordinate, the read-side half of the artifact pair. */
  private def centsFromSums(sums: DataFrame): DataFrame =
    sums.withColumn("c", expr("s div n").cast("double") / lit(1048576.0) - 1)
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), p -> p.c)").as("cv"),
        max(col("n")).as("n")) // n is the label's vector count at every pos

  /** [[centroidDrift]] with the corpus side supplied as its
    * MATERIALIZED sum state ([[labelCentroidSums]] read back from the
    * warehouse) — the production form: per-batch cost is the batch's
    * own centroid aggregate plus a label-cardinality join; the corpus
    * is never re-scanned (the annIvfNewAgainstAssigned discipline
    * applied to the drift monitor). */
  def centroidDriftFromSums(corpusSums: DataFrame, batch: DataFrame): DataFrame = {
    val cc = centsFromSums(corpusSums)
      .select(col("label"), col("cv").as("cv_c"), col("n").as("nc"))
    val cb = centsFromSums(labelCentroidSums(batch))
      .select(col("label"), col("cv").as("cv_b"), col("n").as("nb"))
    val joined = cc.join(cb, Seq("label"), "full_outer")
      .select(col("label"), col("cv_c"), col("cv_b"),
        coalesce(col("nc"), lit(0L)).as("n_corpus"),
        coalesce(col("nb"), lit(0L)).as("n_batch"))
    val tot = joined.agg(sum(col("n_corpus")).as("ct"), sum(col("n_batch")).as("bt"))
    joined.crossJoin(broadcast(tot))
      .select(col("label"), col("n_corpus"), col("n_batch"),
        expr("(n_corpus * 1000000) div greatest(1L, ct)").as("corpus_share_ppm"),
        expr("(n_batch * 1000000) div greatest(1L, bt)").as("batch_share_ppm"),
        expr("abs((n_corpus * 1000000) div greatest(1L, ct) - " +
          "(n_batch * 1000000) div greatest(1L, bt))").as("share_drift_ppm"),
        when(col("cv_c").isNull || col("cv_b").isNull, lit(-2000000L))
          .otherwise(expr("CAST(floor(vec_dot(cv_c, cv_b) / " +
            "(sqrt(vec_dot(cv_c, cv_c)) * sqrt(vec_dot(cv_b, cv_b))) * 1000000.0) " +
            "AS BIGINT)")).as("centroid_cos_micro"))
      .orderBy("label")
  }

  /** ANN top-k via hyperplane-LSH bucketing: exact cosine only within a
    * bucket. Vectors in sparse buckets may return fewer than k
    * neighbors — the accepted ANN trade-off (recall measured in tests). */
  def annLsh(embeddings: DataFrame, planes: Int = 6, dim: Int = 64, k: Int = 3): DataFrame = {
    val e = prepared(embeddings)
      .withColumn("bucket", bucketExpr(planes, dim))
      .select(col("vec_id"), col("v"), col("nrm"), col("bucket"))
      .leased // probed twice; bucket hashing is the expensive map stage
    val q = e.select(col("vec_id").as("qid"), col("bucket"),
      col("v").as("va"), col("nrm").as("na"))
    val n = e.select(col("vec_id").as("nid"), col("bucket"),
      col("v").as("vb"), col("nrm").as("nb"))
    // 2^planes buckets is the JOIN KEY cardinality: unsalted, the pair
    // evaluation runs at most 64 tasks and a clustered corpus (the
    // realistic one — hyperplane signatures collapse near-center
    // vectors into few buckets) serializes onto a handful of cores
    // (measured at sf10: ~4 of 32 live, then ONE straggler carrying the
    // hottest signature's full n_b² pair mass). Salt like
    // [[annIvfWithAssign]]'s cell join, but wider: IVF cells are
    // ~512-wide by construction so [[CellSalt]] = 8 suffices there;
    // LSH bucket occupancy is UNBOUNDED (tens of thousands of
    // near-center vectors share a signature), so the salt must bound
    // the worst bucket's per-task share — [[LshSalt]] caps it at
    // n_b²/64 while replicating only the one-row-per-vector index.
    val pairs = graft.operators.SkewJoin.salted(q, n, Seq("bucket"), LshSalt)
      .where(col("qid") =!= col("nid"))
      .withColumn("cosine", dotExpr("va", "vb") / (col("na") * col("nb")))
    topK(pairs, k)
  }

  /** Margin-based cross-block pair mining (the CCMatrix / Artetxe &
    * Schwenk bitext-mining criterion, with `label` standing in for the
    * language id): candidate pairs are cross-label vectors sharing an
    * IVF cell (the materialized `assign` rn=1 assignment — candidate
    * generation is a cell-keyed join, never all-pairs), scored by
    *
    *   margin(x,y) = 2·cos(x,y) / (avgTopK(x) + avgTopK(y))
    *
    * where avgTopK(v) averages v's k best cross-label in-cell cosines —
    * a pair only mines when it stands OUT of both sides' neighborhoods
    * (absolute-threshold mining drifts with corpus density; the margin
    * self-normalizes). A pair is emitted iff it is MUTUALLY best by
    * margin. Integer fixed point throughout: cosines floor to micros
    * (> 0 only — non-positive similarity can't be a mined pair), so the
    * truncating `div` equals the oracle's floor `//` on positives.
    *
    * Scale shape: pair fanout is bounded by cell width (the IVF
    * blocking), neighborhood averages are the bounded `top_k_pairs`
    * aggregate, and the mutual-best filter is two id-keyed joins of
    * per-vector argmax rows. Nothing quadratic in the corpus. */
  /** The two orientations of a prepared+cell-assigned vector table for
    * candidate pairing ((vec_id, label, cell, v, nrm) → x / y column
    * aliases). */
  private def xSide(ea: DataFrame): DataFrame =
    ea.select(col("vec_id").as("xid"), col("label").as("xlab"),
      col("cell"), col("v").as("vx"), col("nrm").as("nx"))
  private def ySide(ea: DataFrame): DataFrame =
    ea.select(col("vec_id").as("yid"), col("label").as("ylab"),
      col("cell"), col("v").as("vy"), col("nrm").as("ny"))

  /** Cross-label in-cell candidate pairs with positive fixed-point
    * cosine: (xid, xlab, yid, ylab, cos_micro). Fanout bounded by cell
    * width — the IVF blocking that keeps mining non-quadratic. */
  private def crossLabelCand(x: DataFrame, y: DataFrame): DataFrame =
    x.join(y, Seq("cell")).where(col("xlab") =!= col("ylab"))
      .withColumn("cos_micro",
        expr("CAST(floor(vec_dot(vx, vy) / (nx * ny) * 1000000.0) AS BIGINT)"))
      .where(col("cos_micro") > 0)
      .select(col("xid"), col("xlab"), col("yid"), col("ylab"), col("cos_micro"))

  /** Per-vector foreign-neighborhood denominator (id, den): avg of the
    * k best cross-label cosine micros seen from `id`'s side of the
    * candidate set (integer micros are exact in the aggregate's double
    * state). Bounded `top_k_pairs` state per key, map-side partials. */
  private def neighborhoodDenoms(cand: DataFrame, id: String, partner: String,
                                 k: Int): DataFrame =
    cand.groupBy(col(id))
      .agg(expr(s"top_k_pairs($partner, CAST(cos_micro AS DOUBLE), $k)").as("tk"))
      .select(col(id).as("id"),
        expr("aggregate(tk, 0L, (a, p) -> a + CAST(p.score AS BIGINT))").as("sumk"),
        size(col("tk")).as("nk"))
      .select(col("id"), expr("sumk div nk").as("den"))

  /** The margin criterion's per-vector normalizers over the FULL
    * corpus, as their own derivation — warehouse state `margin_denoms`
    * beside `ivf_assign` (refreshed per corpus build, exactly like the
    * index artifacts): the full miner reads it instead of
    * re-aggregating, and the incremental miner scores corpus vectors
    * against the SAME refreshed neighborhoods the full miner used. */
  def marginDenoms(embeddings: DataFrame, assign: DataFrame, k: Int = 3): DataFrame = {
    val e = prepared(embeddings)
    val a1 = assign.where(col("rn") === 1).select(col("vec_id"), col("cell"))
    val ea = e.join(a1, Seq("vec_id"))
    neighborhoodDenoms(crossLabelCand(xSide(ea), ySide(ea)), "xid", "yid", k)
  }

  def marginMining(embeddings: DataFrame, assign: DataFrame, k: Int = 3,
                   denoms: Option[DataFrame] = None): DataFrame = {
    val e = prepared(embeddings)
    val a1 = assign.where(col("rn") === 1).select(col("vec_id"), col("cell"))
    val ea = e.join(a1, Seq("vec_id")).leased // probed as both pair sides
    // directed candidate set: each unordered cross-label in-cell pair
    // appears in both orientations, so per-xid aggregates below see
    // every vector's full foreign neighborhood
    val cand = crossLabelCand(xSide(ea), ySide(ea))
      .leased // feeds the denominator agg AND the margin scoring
    // per-vector neighborhood denominator: avg of the k best foreign
    // cosines — from the materialized `margin_denoms` artifact when
    // supplied (it is THIS aggregate, landed per corpus build), else
    // computed from the candidate set
    val denom = denoms.getOrElse(neighborhoodDenoms(cand, "xid", "yid", k))
    // leased (r15): scored is probed by the best-partner aggregate AND
    // the final mutual-best chain — unleased, the denominator joins
    // re-executed per probe (bounded like cand: one row per candidate)
    val scored = graft.Graft.lease(cand
      .join(denom.select(col("id").as("xid"), col("den").as("den_x")), Seq("xid"))
      .join(denom.select(col("id").as("yid"), col("den").as("den_y")), Seq("yid"))
      .withColumn("margin_ppm",
        expr("(2 * cos_micro * 1000000L) div (den_x + den_y)")))
    // per-vector best partner by margin (tie → lowest partner id)
    val best = scored.groupBy(col("xid"))
      .agg(max(struct(col("margin_ppm"), (-col("yid")).as("neg"))).as("b"))
      .select(col("xid"), (-col("b.neg")).as("best_y"))
    scored.where(col("xid") < col("yid"))
      .join(best, Seq("xid")).where(col("best_y") === col("yid"))
      .join(best.select(col("xid").as("yid"), col("best_y").as("best_x")), Seq("yid"))
      .where(col("best_x") === col("xid"))
      .select(col("xid").as("vec_x"), col("yid").as("vec_y"),
        col("xlab").as("label_x"), col("ylab").as("label_y"),
        col("cos_micro"), col("margin_ppm"))
      .orderBy("vec_x", "vec_y")
  }

  /** [[marginMining]]'s INGESTION shape (the q76/q77 incremental
    * discipline): mine the arriving batch against the immutable corpus
    * only — the new side is map-assigned under the trained codebook,
    * the corpus side reads its materialized assignment, and candidates
    * are the BIPARTITE cross-label in-cell pairs (corpus×corpus never
    * re-pairs). Neighborhood denominators are per side over the
    * bipartite candidate set — the neighborhood a continuous miner can
    * actually afford per batch; the full-corpus variant refines them
    * once per corpus build. Mutual-best and fixed-point rules are
    * identical to the batch operator. */
  def marginMiningBetween(newVecs: DataFrame, corpus: DataFrame,
                          corpusAssign: DataFrame, codebook: DataFrame,
                          k: Int = 3,
                          corpusDenoms: Option[DataFrame] = None,
                          supercells: Option[DataFrame] = None,
                          superMap: Option[DataFrame] = None): DataFrame = {
    // batch assignment under the PRODUCTION selector — the same rule
    // that built the corpus-side `corpusAssign` artifact, so batch and
    // corpus vectors land in comparable cells on either side of the
    // crossover. Single-pass prepared frames (the r14 verdict's task-8
    // audit): each side norms ONCE — the new side inside
    // [[cellAssignWithVec]] (whose two-level branch leases the prepared
    // frame for both the ranking and the vector attach), the corpus
    // side in the one prepared() below; no duplicate-norm shape exists
    // here even when the probe side grows.
    val eNew = cellAssignWithVec(prepared(newVecs), codebook, supercells, superMap)
    val ca = corpusAssign.where(col("rn") === 1).select(col("vec_id"), col("cell"))
    val eCor = prepared(corpus).join(ca, Seq("vec_id"))
    val cand = crossLabelCand(xSide(eNew), ySide(eCor)).leased
    // per-side denominators: the REFRESHED per-corpus-build artifact
    // where a vector has one (so the incremental miner scores against
    // the same neighborhoods the full miner landed — q125≡q137 on
    // shared pairs), falling back to the bipartite-candidate estimate
    // ONLY for vectors the artifact has not seen yet (brand-new
    // vectors in a true ingestion run). The fallback aggregate runs
    // over the anti-joined remainder — empty when the artifact covers
    // the corpus, so the steady cost is two id-keyed semi-joins, not
    // two full top-k aggregations
    def denoms(id: String, partner: String): DataFrame = corpusDenoms match {
      case Some(dn) =>
        val ids = cand.select(col(id).as("id")).distinct()
        val art = dn.select(col("id"), col("den")).join(ids, Seq("id"), "left_semi")
        val missing = ids.join(dn.select(col("id")), Seq("id"), "left_anti")
        val fallback = neighborhoodDenoms(
          cand.join(missing.withColumnRenamed("id", id), Seq(id), "left_semi"),
          id, partner, k)
        art.unionByName(fallback)
      case None => neighborhoodDenoms(cand, id, partner, k)
    }
    val denX = denoms("xid", "yid").select(col("id").as("xid"), col("den").as("den_x"))
    val denY = denoms("yid", "xid").select(col("id").as("yid"), col("den").as("den_y"))
    // leased (r15): probed by BOTH best-partner aggregates and the
    // final mutual-best chain — unleased, the whole denominator
    // semi/anti/fallback subtree re-executed 3× per run (the r15 stage
    // profile showed the duplicate ~8 s scoring stages side by side)
    val scored = graft.Graft.lease(cand.join(denX, Seq("xid")).join(denY, Seq("yid"))
      .withColumn("margin_ppm",
        expr("(2 * cos_micro * 1000000L) div (den_x + den_y)")))
    val bestX = scored.groupBy(col("xid"))
      .agg(max(struct(col("margin_ppm"), (-col("yid")).as("neg"))).as("b"))
      .select(col("xid"), (-col("b.neg")).as("best_y"))
    val bestY = scored.groupBy(col("yid"))
      .agg(max(struct(col("margin_ppm"), (-col("xid")).as("neg"))).as("b"))
      .select(col("yid"), (-col("b.neg")).as("best_x"))
    scored
      .join(bestX, Seq("xid")).where(col("best_y") === col("yid"))
      .join(bestY, Seq("yid")).where(col("best_x") === col("xid"))
      .select(col("xid").as("vec_new"), col("yid").as("vec_corpus"),
        col("xlab").as("label_new"), col("ylab").as("label_corpus"),
        col("cos_micro"), col("margin_ppm"))
      .orderBy("vec_new", "vec_corpus")
  }
}
