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
}
