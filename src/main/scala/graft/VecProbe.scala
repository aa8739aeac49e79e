package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scratch probe: isolate the cost of the literal-centroid IVF
  * assignment's per-row work (dots vs struct array vs sort). */
object VecProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/target/sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.session(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Par.fanOut(Tables.embeddings(spark, sfDir))
    val cb = graft.warehouse.Warehouse.buildIvfCodebook(spark, sfDir)
    val cents = cb.select(col("cid"), col("cv"), col("cnrm")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
    println(s"[probe] ncells=${cents.length}")
    val e = emb.withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("nrm", sqrt(call_function("vec_dot", col("v"), col("v"))))
      .select(col("vec_id"), col("v"), col("nrm")).persist()
    e.count()
    def time(label: String)(df: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        Graft.releaseLeases(); System.gc()
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label: ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    val scored: Seq[Column] = cents.toSeq.map { case (cid, cv, cn) =>
      struct((-(call_function("vec_dot", typedLit(cv.toSeq), col("v")) / (col("nrm") * lit(cn)))).as("nccos"),
        lit(cid).as("cid"))
    }
    val dotsOnly: Seq[Column] = cents.toSeq.map { case (_, cv, _) =>
      call_function("vec_dot", typedLit(cv.toSeq), col("v"))
    }
    time("dots only (sum of ncells vec_dot)")(
      e.select(col("vec_id"), dotsOnly.reduce(_ + _).as("s")))
    time("struct array, no sort")(
      e.select(col("vec_id"), array(scored: _*).as("a")).select(col("vec_id"), element_at(col("a"), 1)))
    time("struct array + sort_array")(
      e.select(col("vec_id"), sort_array(array(scored: _*)).as("a"))
        .select(col("vec_id"), element_at(col("a"), 1)))
    time("posexplode over PERSISTED prepared")(
      e.select(col("vec_id"), posexplode(sort_array(array(scored: _*))).as(Seq("r0", "c")))
        .select(col("vec_id"), col("c.cid").as("cell"), (col("r0") + 1).cast("int").as("rn")))
    val eInline = emb.withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("nrm", sqrt(call_function("vec_dot", col("v"), col("v"))))
      .select(col("vec_id"), col("v"), col("nrm"))
    time("posexplode over INLINE prepared (cellAssignments shape)")(
      eInline.select(col("vec_id"), posexplode(sort_array(array(scored: _*))).as(Seq("r0", "c")))
        .select(col("vec_id"), col("c.cid").as("cell"), (col("r0") + 1).cast("int").as("rn")))
    time("alias then posexplode over INLINE prepared")(
      eInline.withColumn("__cells", sort_array(array(scored: _*)))
        .select(col("vec_id"), posexplode(col("__cells")).as(Seq("r0", "c")))
        .select(col("vec_id"), col("c.cid").as("cell"), (col("r0") + 1).cast("int").as("rn")))
    // exact body copy of cellAssignments (prepared() inlined)
    val prepLike = graft.Par.fanOut(emb)
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("nrm", sqrt(call_function("vec_dot", col("v"), col("v"))))
      .select(col("vec_id"), col("label"), col("v"), col("nrm"))
    time("exact replica incl. prepared()")(
      prepLike
        .withColumn("__cells", sort_array(array(scored: _*)))
        .select(col("vec_id"), posexplode(col("__cells")).as(Seq("r0", "c")))
        .select(col("vec_id"), col("c.cid").as("cell"),
          (col("r0") + 1).cast("int").as("rn")))
    def explodeShape(base: DataFrame): DataFrame =
      base.withColumn("__cells", sort_array(array(scored: _*)))
        .select(col("vec_id"), posexplode(col("__cells")).as(Seq("r0", "c")))
        .select(col("vec_id"), col("c.cid").as("cell"), (col("r0") + 1).cast("int").as("rn"))
    time("bisect: fanOut, NO label")(explodeShape(
      graft.Par.fanOut(emb)
        .withColumn("v", col("embedding").cast("array<double>"))
        .withColumn("nrm", sqrt(call_function("vec_dot", col("v"), col("v"))))
        .select(col("vec_id"), col("v"), col("nrm"))))
    time("bisect: no fanOut, WITH label")(explodeShape(
      emb.withColumn("v", col("embedding").cast("array<double>"))
        .withColumn("nrm", sqrt(call_function("vec_dot", col("v"), col("v"))))
        .select(col("vec_id"), col("label"), col("v"), col("nrm"))))
    time("full cellAssignments")(
      graft.vector.Similarity.cellAssignments(emb, cb))
    time("RERUN at end: alias posexplode INLINE no-label (the earlier-fast shape)")(
      eInline.withColumn("__cells", sort_array(array(scored: _*)))
        .select(col("vec_id"), posexplode(col("__cells")).as(Seq("r0", "c")))
        .select(col("vec_id"), col("c.cid").as("cell"), (col("r0") + 1).cast("int").as("rn")))
    def exprCounts(tag: String, df: DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      def c(sub: String) = sub.r.findAllIn(p).size
      println(s"[probe] $tag: len=${p.length} vec_dot=${c("vec_dot")} " +
        s"sort_array=${c("sort_array")} Generate=${c("Generate")} " +
        s"Project=${c("Project")} Exchange=${c("Exchange")}")
    }
    exprCounts("FAST plan", explodeShape(eInline))
    exprCounts("SLOW plan", explodeShape(
      emb.withColumn("v", col("embedding").cast("array<double>"))
        .withColumn("nrm", sqrt(call_function("vec_dot", col("v"), col("v"))))
        .select(col("vec_id"), col("label"), col("v"), col("nrm"))))
    def skeleton(tag: String, df: DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      val sk = p.linesIterator.map { l =>
        val t = l.replaceAll("\\[[-0-9.,E]{40,}\\]", "[..lit..]")
        if (t.length > 140) t.take(140) + "…" else t
      }.take(25).mkString("\n")
      println(s"[probe] $tag skeleton:\n$sk")
    }
    skeleton("FAST", explodeShape(eInline))
    skeleton("SLOW", explodeShape(
      emb.withColumn("v", col("embedding").cast("array<double>"))
        .withColumn("nrm", sqrt(call_function("vec_dot", col("v"), col("v"))))
        .select(col("vec_id"), col("label"), col("v"), col("nrm"))))
    spark.stop()
  }
}
