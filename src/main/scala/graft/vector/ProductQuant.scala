package graft.vector

import graft.Graft.LeaseOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Similarity.{dotCol, dotExpr}

/** Product quantization (PQ) — the compression layer of billion-vector
  * similarity search (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011; the FAISS IVF-PQ recipe): split each
  * d-dim vector into `m` subvectors, vector-quantize each subspace
  * against its own `ksub`-entry codebook, and store only the m byte
  * codes (64 floats → 4 bytes at the defaults here). Search runs
  * ASYMMETRICALLY (ADC): the query stays uncompressed, each probed
  * subspace contributes a table lookup — approx_dot(q, x) =
  * Σ_s dot(q_s, codebook_s[code_s(x)]) — and only a short ADC-ranked
  * shortlist pays exact re-ranking against full vectors.
  *
  * Scale posture (100 TB): codes are the ONLY per-vector state the
  * search shuffles (m bytes vs d floats — a 64× cut at the defaults);
  * codebooks are literal-sized (m × ksub × d/m doubles) and fold into
  * the plan like the IVF centroids; encoding and lookup-table
  * construction are pure map stages; the re-rank join touches full
  * vectors only for shortlist survivors.
  *
  * Determinism: codebooks come from the same decimal-sum k-means as the
  * IVF path ([[Similarity.trainIvfCentroids]]'s trainer applied to
  * subvector slices), codes break ties toward the lower index, and ADC
  * sums its m lookups in fixed subspace order — bit-reproducible end to
  * end, which the equality spec pins.
  */
object ProductQuant {

  /** Per-subspace codebooks for `dim`-dim vectors: subspace s covers
    * slice [s·dim/m, (s+1)·dim/m). Codebook entries are L2 k-means
    * centroids of the subvector population (decimal-sum Lloyd
    * iterations, first-`ksub` seeds, empty cells keep their centroid —
    * the [[Similarity]] trainer's determinism rules). */
  def trainCodebooks(embeddings: DataFrame, dim: Int, m: Int = 4, ksub: Int = 16,
                     iters: Int = 3, sampleMod: Int = 4): Seq[Seq[Seq[Double]]] = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val dsub = dim / m
    val base = graft.Par.fanOut(embeddings)
      .withColumn("v", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("v"))
    val sampled = (if (sampleMod > 1) base.where(pmod(col("vec_id"), lit(sampleMod)) === 0)
                   else base).persist()
    sampled.count()
    val books = (0 until m).map { s =>
      val sub = sampled.select(col("vec_id"),
        expr(s"slice(v, ${s * dsub + 1}, $dsub)").as("sv"))
      trainSubspace(sub, ksub, iters)
    }
    sampled.unpersist()
    books
  }

  /** L2 Lloyd iterations over one subspace table (vec_id, sv).
    * argmin ‖x−c‖² = argmin (‖c‖² − 2·x·c) — norms of x cancel. */
  private def trainSubspace(sub: DataFrame, ksub: Int, iters: Int): Seq[Seq[Double]] = {
    var cents = sub.orderBy("vec_id").limit(ksub)
      .select(col("sv")).collect().map(_.getSeq[Double](0).toSeq).toSeq
    if (cents.isEmpty) return Seq.empty
    val dsub = cents.head.length
    for (_ <- 1 to iters) {
      val scores = cents.map { c =>
        val cn2 = c.map(x => x * x).sum
        lit(cn2) - lit(2.0) * dotCol(typedLit(c), col("sv"))
      }
      val assigned = sub.withColumn("__sc", array(scores: _*))
        .withColumn("code",
          (expr("array_position(__sc, array_min(__sc))") - 1).cast("int"))
      val sums = assigned
        .select(col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("code"), col("pos"))
        .agg(sum(col("x").cast("decimal(30,15)")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = Array.tabulate(cents.length, dsub)((c, p) => cents(c)(p))
      sums.foreach { r =>
        next(r.getAs[Int]("code"))(r.getAs[Int]("pos")) =
          r.getAs[java.math.BigDecimal]("s").doubleValue() / r.getAs[Long]("n")
      }
      cents = next.map(_.toSeq).toSeq
    }
    cents
  }

  /** PQ codes per vector: (vec_id, codes array<int>, length m). Code =
    * argmin ‖x_s − c‖² = argmin (‖c‖² − 2·x_s·c), first-wins ties →
    * lowest code. */
  def encode(embeddings: DataFrame, dim: Int, books: Seq[Seq[Seq[Double]]]): DataFrame = {
    val m = books.length
    require(m > 0 && dim % m == 0)
    val dsub = dim / m
    var df = graft.Par.fanOut(embeddings)
      .withColumn("v", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("v"))
    books.zipWithIndex.foreach { case (book, s) =>
      val scores = book.map { c =>
        val cn2 = c.map(x => x * x).sum
        lit(cn2) - lit(2.0) * dotCol(typedLit(c), expr(s"slice(v, ${s * dsub + 1}, $dsub)"))
      }
      df = df.withColumn(s"__sc$s", array(scores: _*))
        .withColumn(s"code$s",
          (expr(s"array_position(__sc$s, array_min(__sc$s))") - 1).cast("int"))
        .drop(s"__sc$s")
    }
    df.select(col("vec_id"),
      array((0 until m).map(s => col(s"code$s")): _*).as("codes"))
  }

  /** ADC lookup tables for a query vector column `v`: for each subspace,
    * the array of dot(q_s, c_j) over the codebook — shipped as one
    * column per subspace so the score is m element_at lookups.
    * `transform` over ONE literal codebook matrix instead of `array` of
    * ksub separate literal dots: the expression tree shrinks m·ksub× (64
    * codegen'd dot nodes → 4 transform nodes), which is most of the
    * query's cold plan/codegen cost; the per-row work is identical (ksub
    * dots of dsub doubles per subspace) and the hot ADC lookup +
    * shortlist stages stay codegen'd. */
  private def lutCols(books: Seq[Seq[Seq[Double]]], dsub: Int): Seq[Column] =
    books.zipWithIndex.map { case (book, s) =>
      transform(typedLit(book), c =>
        dotCol(expr(s"slice(va, ${s * dsub + 1}, $dsub)"), c)).as(s"__lut$s")
    }

  /** Per-IVF-cell PQ reconstruction-error audit — the index-quality
    * eval that tells you WHICH cells need codebook retraining (the q99
    * pattern applied to quantization): for every vector, reconstruct it
    * from its m codes, take the squared error against the original in
    * integer fixed point (per-dim diff floored at 2^20), and roll up
    * per assigned cell.
    *
    * Determinism: the per-dim diff (x − c) is the same double on both
    * engines (both read the same embedding/codebook parquet), so
    * floor(diff·2^20) is the same BIGINT; squares (≤ ~4·10^12 per dim,
    * ≤ ~3·10^14 per vector) sum exactly in int64.
    *
    * Scale posture: codes/codebook/assignment are the materialized
    * warehouse index state; the audit is two bounded joins (codebook is
    * literal-sized; assignment is 3 ints/vector) + map-side-combined
    * aggregates — one pass over the corpus vectors, no candidate pairs
    * at all. Output: (cell, n_vectors, mean_err_fix, max_err_fix). */
  def cellReconstructionError(embeddings: DataFrame, codes: DataFrame,
                              booksTable: DataFrame, assign: DataFrame,
                              dim: Int, m: Int = 4): DataFrame = {
    require(m > 0 && dim % m == 0)
    val dsub = dim / m
    val e = graft.Par.fanOut(embeddings)
      .withColumn("v", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("v"))
    val perSub = codes
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("subspace", "code")))
      .join(broadcast(booksTable.select(col("subspace"), col("code"), col("cv"))),
        Seq("subspace", "code"))
      .join(e, Seq("vec_id"))
      .select(col("vec_id"), expr(
        s"""aggregate(
           |  zip_with(slice(v, subspace * $dsub + 1, $dsub), cv,
           |           (x, c) -> CAST(floor((x - c) * 1048576) AS BIGINT)),
           |  0L, (a, dd) -> a + dd * dd)""".stripMargin).as("serr"))
    perSub
      .groupBy(col("vec_id")).agg(sum(col("serr")).as("err"))
      .join(assign.where(col("rn") === 1).select(col("vec_id"), col("cell")), Seq("vec_id"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("err")).as("se"), max(col("err")).as("max_err_fix"))
      .select(col("cell"), col("n_vectors"),
        expr("se div n_vectors").as("mean_err_fix"), col("max_err_fix"))
      .orderBy("cell")
  }

  /** IVF-PQ search with exact re-rank: coarse IVF cells confine the
    * candidate set ([[Similarity]]'s cell discipline), ADC ranks the
    * in-cell candidates from codes alone, the top `shortlist` per query
    * pay an exact-cosine re-rank, and the top `k` of those are emitted.
    * Output: qid, rank, nid, cosine (exact — re-ranked). */
  def annIvfPq(embeddings: DataFrame, ivfCodebook: DataFrame,
               books: Seq[Seq[Seq[Double]]], dim: Int,
               k: Int = 3, nprobe: Int = 6, shortlist: Int = 12,
               codesOpt: Option[DataFrame] = None,
               assignOpt: Option[DataFrame] = None): DataFrame = {
    require(shortlist >= k)
    require(nprobe >= 1, "nprobe must be positive") // the outer-explode
    // equivalence below assumes a non-empty probe slice
    if (books.isEmpty) // no corpus → no codebooks → empty result, same schema
      return embeddings.sparkSession.range(0)
        .select(col("id").as("qid"), col("id").as("rank"),
          col("id").as("nid"), col("id").cast("double").as("cosine"))
    val m = books.length
    val dsub = dim / m
    val e = graft.Par.fanOut(embeddings)
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("nrm", sqrt(dotExpr("v", "v")))
      .select(col("vec_id"), col("v"), col("nrm"))
      .leased
    e.count() // eager fill: assignment, probe and re-rank all read e
    // Codes and cell assignment are CORPUS STATE (encoded/ranked once
    // per corpus build): production passes the materialized warehouse
    // tables (graft.warehouse.Warehouse pq_codes / ivf_assign) so the
    // per-query plan pays lookup + re-rank only — the inline fallback
    // (encode + literal-centroid sort; the Similarity.ivfSearch
    // rationale, tie-break (−ccos, cid) = the oracle's ccos DESC, cid)
    // exists for ad-hoc codebooks in specs.
    val codes = codesOpt.getOrElse(encode(embeddings, dim, books))
    val (probeCells, idxCells) = assignOpt match {
      case Some(a) =>
        (a.where(col("rn") <= nprobe).select(col("vec_id"), col("cell")),
         a.where(col("rn") === 1).select(col("vec_id"), col("cell")))
      case None =>
        val cents = ivfCodebook.select(col("cid"), col("cv"), col("cnrm")).collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
        val scored = cents.map { case (cid, cv, cn) =>
          struct((-(dotCol(typedLit(cv.toSeq), col("v")) / (col("nrm") * lit(cn)))).as("nccos"),
            lit(cid).as("cid"))
        }
        val eA = e.withColumn("__cells", sort_array(array(scored.toSeq: _*)))
        // explode_OUTER: the plain generator's inferred size() filter
        // re-evaluates the ncells-literal sort per row (see the
        // Similarity.cellAssignments note); slice of a statically
        // non-empty array with nprobe ≥ 1 is non-empty, outer ≡ inner
        (eA.select(col("vec_id"), explode_outer(expr(s"slice(__cells, 1, $nprobe)")).as("__pc"))
           .select(col("vec_id"), col("__pc.cid").as("cell")),
         eA.select(col("vec_id"), expr("__cells[0].cid").as("cell")))
    }
    // query side: full vector + per-subspace LUTs (map-only). The query
    // vector rides through the candidate window here — measured faster
    // at this scale (one re-rank join instead of two). At billion-vector
    // scale with queries ≪ corpus, switch to a narrow (qid, nid, adc)
    // window and re-attach query vectors by qid for shortlist survivors
    // only: the shuffle-byte cut then outweighs the extra join.
    val q = probeCells.join(e, Seq("vec_id"))
      .select(col("vec_id").as("qid"), col("cell"), col("v").as("va"), col("nrm").as("na"))
    val qLut = q.select(Seq(col("qid"), col("cell"), col("va"), col("na")) ++
      lutCols(books, dsub): _*)
    // index side: CODES ONLY (m bytes of state per vector in the shuffle)
    val n = codes.join(idxCells, Seq("vec_id"))
      .select(col("vec_id").as("nid"), col("cell"), col("codes"))
    // ADC score: fixed subspace-order sum of table lookups
    val adc = (0 until m).map(s =>
      element_at(col(s"__lut$s"), element_at(col("codes"), s + 1) + 1)).reduce(_ + _)
    val cand = qLut.join(n, Seq("cell")).where(col("qid") =!= col("nid"))
      .withColumn("adc", adc)
    // bounded shortlist selection: top_k_pairs state = `shortlist`
    // (nid, adc) pairs per query, where the rank window it replaces
    // sorted EVERY in-cell candidate per query; the query vector (va,
    // na) is constant per qid and rides through first()
    val short = cand.groupBy(col("qid")).agg(
        expr(s"top_k_pairs(nid, adc, $shortlist)").as("tk"),
        first(col("va")).as("va"), first(col("na")).as("na"))
      .select(col("qid"), col("va"), col("na"),
        explode(expr("transform(tk, p -> p.id)")).as("nid"))
    // exact re-rank of the shortlist only
    val rer = short
      .join(e.select(col("vec_id").as("nid"), col("v").as("vb"), col("nrm").as("nb")),
        Seq("nid"))
      .withColumn("cosine", dotExpr("va", "vb") / (col("na") * col("nb")))
    rer.groupBy(col("qid")).agg(expr(s"top_k_pairs(nid, cosine, $k)").as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("r0", "p")))
      .select(col("qid"), (col("r0") + 1).cast("long").as("rank"),
        col("p.id").as("nid"), col("p.score").as("cosine"))
      .orderBy("qid", "rank")
  }
}
