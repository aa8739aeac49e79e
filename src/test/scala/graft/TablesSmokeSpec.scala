package graft

import org.apache.spark.sql.types.TimestampType

/** Ingest smoke-gate against the LIVE corpus: every `Tables.*` loader
  * must ANALYZE (not execute) against /root/testdata as it exists right
  * now. In r7 the driver regenerated the corpus mid-round and re-typed
  * events.ts (TIMESTAMP_NANOS→MICROS); the loader's shim failed analysis
  * and 39 queries died with opaque per-query errors. This spec makes the
  * next source-schema drift fail in ONE named test per table instead.
  *
  * `.schema` forces full analysis of the loader's projection; touching
  * one column per table additionally pins the columns every downstream
  * query assumes. */
class TablesSmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val expectedColumn = Map[String, String](
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey", "events" -> "ts",
    "documents" -> "doc_id", "embeddings" -> "vec_id")

  private val loaders = Map[String, () => org.apache.spark.sql.DataFrame](
    "region" -> (() => Tables.region(spark, sfDir)),
    "nation" -> (() => Tables.nation(spark, sfDir)),
    "customer" -> (() => Tables.customer(spark, sfDir)),
    "supplier" -> (() => Tables.supplier(spark, sfDir)),
    "part" -> (() => Tables.part(spark, sfDir)),
    "orders" -> (() => Tables.orders(spark, sfDir)),
    "lineitem" -> (() => Tables.lineitem(spark, sfDir)),
    "events" -> (() => Tables.events(spark, sfDir)),
    "documents" -> (() => Tables.documents(spark, sfDir)),
    "embeddings" -> (() => Tables.embeddings(spark, sfDir)))

  for ((name, load) <- loaders.toSeq.sortBy(_._1)) {
    test(s"$name loader analyzes against the live corpus") {
      val schema = load().schema // throws here on drift, naming the table
      assert(schema.fieldNames.contains(expectedColumn(name)),
        s"$name lost expected column '${expectedColumn(name)}': " +
          schema.fieldNames.mkString(", "))
    }
  }

  test("events.ts normalizes to a session-zoned timestamp for ANY corpus generation") {
    val dt = Tables.events(spark, sfDir).schema("ts").dataType
    assert(dt == TimestampType,
      s"events.ts must land as TIMESTAMP (session UTC), got $dt")
  }
}
