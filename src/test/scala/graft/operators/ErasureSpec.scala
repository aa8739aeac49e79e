package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ErasureSpec extends SparkSpec {
  import spark.implicits._

  private val table = Seq(
    (1L, "a"), (2L, "b"), (2L, "b2"), (3L, "c"), (4L, "d")).toDF("uid", "v")
  private val victims = Seq(2L, 4L, 99L).toDF("key") // 99 absent: no-op

  test("erase drops exactly the victim-keyed rows") {
    val kept = Erasure.erase(table, "uid", victims)
      .select("uid").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("audit counts reconcile and the leak check is zero") {
    val got = Erasure.audit(Seq(("t", table, "uid")), victims).collect().head
    assert(got.getString(0) == "t")
    assert((got.getLong(1), got.getLong(2), got.getLong(3), got.getLong(4))
      == ((5L, 3L, 2L, 0L)))
  }

  test("audit over multiple tables emits one reconciled row each") {
    val other = Seq((4L, 1), (5L, 2)).toDF("id", "x")
    val rows = Erasure.audit(
      Seq(("t1", table, "uid"), ("t2", other, "id")), victims)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows("t1") == ((5L, 3L, 2L, 0L)))
    assert(rows("t2") == ((2L, 1L, 1L, 0L)))
    // invariant: before = deleted + after, leak = 0
    rows.values.foreach { case (nb, nd, na, nl) => assert(nb == nd + na && nl == 0L) }
  }

  test("eraseAny drops rows where ANY key hits; auditAny reconciles") {
    val pairs = Seq((1L, 2L), (3L, 5L), (2L, 6L), (7L, 8L)).toDF("a", "b")
    val kept = Erasure.eraseAny(pairs, Seq("a", "b"), victims)
      .as[(Long, Long)].collect().toSet
    assert(kept == Set((3L, 5L), (7L, 8L))) // both rows touching victim 2 die
    val row = Erasure.auditAny("p", pairs, Seq("a", "b"), victims).collect().head
    assert((row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
      == ((4L, 2L, 2L, 0L)))
  }

  test("repairDistinctIndex keeps a key only while a surviving occurrence carries it") {
    val occ = Seq((1L, 100L), (2L, 100L), (2L, 200L), (3L, 300L))
      .toDF("doc_id", "h") // h=100 shared by victim 2 and survivor 1
    val idx = occ.select($"h").distinct()
    val repaired = Erasure.repairDistinctIndex(idx, "h",
        Erasure.erase(occ, "doc_id", victims))
      .as[Long].collect().toSet
    // 200 dies (only victim 2 carried it); 100 survives via doc 1
    assert(repaired == Set(100L, 300L))
  }

  test("victim-scoped repair ≡ full repair (shared, victim-only, and untouched keys)") {
    // h=100 shared victim+survivor (stays), h=200 victim-only (dies),
    // h=300 survivor-only / untouched by the victim set (stays WITHOUT
    // ever being probed — the point of victim-scoping)
    val occ = Seq((1L, 100L), (2L, 100L), (2L, 200L), (3L, 300L))
      .toDF("doc_id", "h")
    val idx = occ.select($"h").distinct()
    val erased = Erasure.erase(occ, "doc_id", victims)
    val victimCarried = occ.join(victims.withColumnRenamed("key", "doc_id"),
      Seq("doc_id"), "left_semi").select($"h").distinct()
    val scoped = Erasure.repairDistinctIndexVictimScoped(idx, "h", erased, victimCarried)
      .as[Long].collect().toSet
    val full = Erasure.repairDistinctIndex(idx, "h", erased)
      .as[Long].collect().toSet
    assert(scoped == full && scoped == Set(100L, 300L))
    // replay shape: after the base erase the victim evidence is gone —
    // an EMPTY victim-carried set must be a no-op on the already-
    // repaired index (crash-replay convergence relies on this)
    val replayed = Erasure.repairDistinctIndexVictimScoped(
        Erasure.repairDistinctIndex(idx, "h", erased), "h", erased,
        victimCarried.limit(0))
      .as[Long].collect().toSet
    assert(replayed == full)
  }

  test("relabelClusters removes victims and relabels clusters whose label WAS a victim") {
    // cluster labeled 2 (victim) with survivors {5, 9}; cluster {3}
    // untouched; victim-only cluster {4} vanishes
    val clusters = Seq((2L, 2L), (5L, 2L), (9L, 2L), (3L, 3L), (4L, 4L))
      .toDF("doc_id", "cluster_id")
    val rel = Erasure.relabelClusters(clusters, victims)
      .as[(Long, Long)].collect().toSet
    assert(rel == Set((5L, 5L), (9L, 5L), (3L, 3L)))
    // no erased id survives anywhere — member or label
    assert(!rel.exists { case (d, c) => Set(2L, 4L).contains(d) || Set(2L, 4L).contains(c) })
  }
}
