package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashes.
  *
  * The DuckDB oracle cannot evaluate Spark's Murmur3 `hash()` and Spark
  * cannot evaluate DuckDB's `hash()`, so every hash that participates in a
  * verified result is derived from MD5 hex — identical in both engines:
  *
  *   Spark :  conv(substring(md5(s), 1, k), 16, 10)::long
  *   DuckDB:  CAST('0x' || substr(md5(s), 1, k) AS BIGINT)
  *
  * k=15 hex chars → 60-bit hash (fits signed int64 with headroom);
  * k=7  hex chars → 28-bit hash (safe for modular arithmetic whose
  * intermediate products must stay inside int64).
  */
object PortableHash {
  /** 60-bit md5-derived hash of a string column. */
  def h60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 28-bit md5-derived hash of a string column (for mulmod chains). */
  def h28(c: Column): Column = conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** JVM-side twin of [[h60]] for custom Expressions (SimHash etc.). */
  def h60jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** JVM-side twin of [[h28]] — e.g. for folding derived constants
    * (LSH hyperplanes) into literals at plan-build time. */
  def h28jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 7), 16)
  }
}
