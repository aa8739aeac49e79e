package graft.operators

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def run(before: Seq[(Long, Option[String])], after: Seq[(Long, Option[String])]) =
    SnapshotDiff.diff(
        before.toDF("id", "v"), after.toDF("id", "v"), "id", Seq("v"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)), Option(r.getString(3))))
      .sortBy(_._1)

  test("insert, delete, update, and unchanged are classified correctly") {
    val got = run(
      before = Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("c"))),
      after = Seq((2L, Some("b")), (3L, Some("x")), (4L, Some("d"))))
    assert(got.toSeq == Seq(
      (1L, "delete", Some("a"), None),
      (3L, "update", Some("c"), Some("x")),
      (4L, "insert", None, Some("d"))))
  }

  test("NULL-to-value and value-to-NULL transitions are updates (null-safe compare)") {
    val got = run(
      before = Seq((1L, None), (2L, Some("b")), (3L, None)),
      after = Seq((1L, Some("a")), (2L, None), (3L, None)))
    assert(got.toSeq == Seq(
      (1L, "update", None, Some("a")),
      (2L, "update", Some("b"), None)))
  }

  test("identical snapshots diff to nothing") {
    assert(run(Seq((1L, Some("a"))), Seq((1L, Some("a")))).isEmpty)
  }

  test("applyChanges is the exact inverse of diff (roundtrip, incl. NULLs)") {
    val before = Seq((1L, Option("a")), (2L, Option("b")), (3L, Option.empty[String]),
      (5L, Option("e"))).toDF("id", "v")
    val after = Seq((2L, Option("b")), (3L, Option("x")), (4L, Option.empty[String]),
      (5L, Option("e"))).toDF("id", "v")
    val changes = SnapshotDiff.diff(before, after, "id", Seq("v"))
    val applied = SnapshotDiff.applyChanges(before, changes, "id", Seq("v"))
    assert(rowsOf(applied) == rowsOf(after))
  }

  test("applyChanges with an empty change feed is identity") {
    val snap = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val none = SnapshotDiff.diff(snap, snap, "id", Seq("v"))
    assert(rowsOf(SnapshotDiff.applyChanges(snap, none, "id", Seq("v"))) == rowsOf(snap))
  }

  test("multi-column applyChanges roundtrip") {
    val before = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("id", "v", "n")
    val after = Seq((1L, "a", 11), (3L, "c", 30), (4L, "d", 40)).toDF("id", "v", "n")
    val changes = SnapshotDiff.diff(before, after, "id", Seq("v", "n"))
    assert(rowsOf(SnapshotDiff.applyChanges(before, changes, "id", Seq("v", "n")))
      == rowsOf(after))
  }

  test("multi-column compare flags a change in ANY tracked column") {
    val before = Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "v", "n")
    val after = Seq((1L, "a", 11), (2L, "b", 20)).toDF("id", "v", "n")
    val got = SnapshotDiff.diff(before, after, "id", Seq("v", "n")).collect()
    assert(got.length == 1)
    assert(got.head.getLong(0) == 1L && got.head.getString(1) == "update")
    assert(got.head.getInt(4) == 10 && got.head.getInt(5) == 11) // old_n, new_n
  }
}
