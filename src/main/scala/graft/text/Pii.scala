package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction pass every training-data pipeline runs
  * before a corpus ships (emails, phone numbers, national-id shapes,
  * IP addresses → typed placeholder tokens).
  *
  * Patterns are deliberately restricted to the regex subset with
  * IDENTICAL semantics in Java regex (Spark codegen) and RE2 (the
  * DuckDB oracle): character classes, counted repetition, alternation —
  * no lookarounds, no backreferences. Matching is leftmost greedy in
  * both engines, so match sets (and therefore counts and redacted text)
  * are engine-exact and the oracle hash-gates the scrubber itself.
  *
  * Scale posture: pure map stage (fanOut + one projection; counts on
  * the original text, then a fixed-order chain of replaces) — no
  * shuffle, streams through whole-stage codegen, trivially 100 TB-safe.
  */
object Pii {

  /** (pattern, placeholder) in APPLICATION ORDER. The national-id shape
    * (3-2-4 digits) is redacted before phones (3-3-4) so the two digit
    * grammars never compete; emails before IPs so a dotted-quad inside
    * a mail domain is already gone. */
  val Rules: Seq[(String, String)] = Seq(
    ("[0-9]{3}-[0-9]{2}-[0-9]{4}", "<ID>"),
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
    ("[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"))

  private val CountCols = Seq("n_ids", "n_emails", "n_ips", "n_phones")

  /** Redact `textCol`, keeping per-rule hit counts (counted on the
    * ORIGINAL text, before any replacement) and the scrubbed text.
    * Output columns: every input column, n_ids, n_emails, n_ips,
    * n_phones, redacted. */
  def scrub(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val counted = Rules.zip(CountCols).foldLeft(graft.Par.fanOut(df)) {
      case (d, ((pat, _), cname)) =>
        d.withColumn(cname, regexp_count(t, lit(pat)).cast("long"))
    }
    val redacted: Column = Rules.foldLeft(t) { case (c, (pat, repl)) =>
      regexp_replace(c, lit(pat), lit(repl))
    }
    counted.withColumn("redacted", redacted)
  }
}
