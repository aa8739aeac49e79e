package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DqAuditSpec extends SparkSpec {
  import spark.implicits._

  private def violations(df: org.apache.spark.sql.DataFrame): Long =
    df.collect().head.getLong(1)

  test("fkCheck counts unresolvable FKs, including NULL FKs") {
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("k")
    assert(violations(DqAudit.fkCheck("c", child, "fk", dim, "k")) == 2L)
  }

  test("fkCheck is duplicate-dim safe (keys deduped before the anti join)") {
    val child = Seq(1L, 1L, 2L).toDF("fk")
    val dim = Seq(1L, 1L, 1L).toDF("k") // dup keys must not multiply matches
    assert(violations(DqAudit.fkCheck("c", child, "fk", dim, "k")) == 1L)
  }

  test("dupKeyCheck counts keys with multiple rows, not the extra rows") {
    val df = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("id")
    assert(violations(DqAudit.dupKeyCheck("d", df, "id")) == 2L)
  }

  test("countCheck on clean data reports zero, keeping the report row") {
    val df = Seq(1L, 2L).toDF("v")
    val got = DqAudit.countCheck("clean", df, col("v") < 0).collect()
    assert(got.length == 1 && got.head.getString(0) == "clean" && got.head.getLong(1) == 0L)
  }

  test("star-schema audit on the sf0.001 corpus: one row per check, all non-negative") {
    val rows = DqAudit.auditStarSchema(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 11)
    assert(rows.map(_.getString(0)).distinct.length == 11)
    rows.foreach(r => assert(r.getLong(1) >= 0L))
  }
}
