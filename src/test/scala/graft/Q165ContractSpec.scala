package graft

import org.apache.spark.sql.functions._

/** Pins the q165 engine/oracle parser-agreement contract (r14 ADVICE):
  * the quarantine gate compares Spark's from_json corrupt channel with
  * DuckDB's json_valid, and those agree only on the overlap the query
  * options pin — strict-JSON syntax errors. Spark's corrupt channel
  * ALSO fires on schema/type mismatch (json_valid would pass those),
  * and Jackson's default leniency (single quotes) would pass inputs
  * json_valid rejects. The q165 options close the second gap
  * (allowSingleQuotes=false); this spec documents the first as the
  * standing reliance: the datagen's props are strict JSON objects with
  * INTEGER k, so type-mismatch rows never occur upstream of the plant
  * rule. If the fixture schema ever changes, these assertions say
  * which side of the parity breaks. */
class Q165ContractSpec extends SparkSpec {

  private val opts = Map("columnNameOfCorruptRecord" -> "_corrupt",
    "mode" -> "PERMISSIVE", "allowSingleQuotes" -> "false")

  private def errKind(s: String): String = {
    import spark.implicits._
    Seq(Option(s)).toDF("p")
      .withColumn("j", from_json(col("p"), "k BIGINT, _corrupt STRING", opts))
      .withColumn("err_kind",
        when(col("p").isNull, lit("null_props"))
          .when(col("j._corrupt").isNotNull, lit("malformed"))
          .otherwise(lit("ok")))
      .select("err_kind").head().getString(0)
  }

  test("strict object with integer k parses ok — the datagen shape") {
    assert(errKind("""{"k": 42}""") === "ok")
  }

  test("planted faults classify malformed/null exactly as the oracle's json_valid") {
    assert(errKind("""{"k": 42""") === "malformed")      // truncated object
    assert(errKind("""garbage<<{"k": 42}""") === "malformed") // leading garbage
    assert(errKind(null) === "null_props")
  }

  test("single-quoted JSON is malformed under the pinned options (json_valid agrees)") {
    // Jackson's default allowSingleQuotes=true would parse this ok and
    // fork from DuckDB's json_valid — the option pin closes the gap.
    assert(errKind("{'k': 1}") === "malformed")
  }

  test("documented reliance: type mismatch fires Spark's corrupt channel but NOT json_valid") {
    // {"k": 1.5} is VALID JSON (json_valid → ok) yet Spark's BIGINT
    // schema routes it to the corrupt channel → malformed. Parity holds
    // in q165 only because the datagen emits integer k; this test keeps
    // the reliance visible rather than silently load-bearing.
    assert(errKind("""{"k": 1.5}""") === "malformed")
  }
}
