package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic synthesized tiebreak, shared by [[Scd2.eventsMerge]]
  * and [[FactBuild.firstEventFacts]] (round-1 review: no corpus table
  * ships a column literally named `tiebreak`): an md5-derived 60-bit
  * hash of every column of the row.
  *
  * Rendering rules that keep it collision-free where it matters:
  *  - `\u0001` column separator — a separator-less concat collides
  *    boundary-shifted rows (("ab","c") vs ("a","bc")), and printable
  *    separators like "|" can occur in the data;
  *  - `\u0002` NULL sentinel — concat_ws silently DROPS nulls, so
  *    (NULL,"X") and ("X",NULL) would otherwise render, and hash,
  *    identically, leaving the tie unresolved and version order
  *    partition-dependent.
  */
object Tiebreak {
  def synth(df: DataFrame): Column =
    graft.functions.PortableHash.h60(
      concat_ws("\u0001",
        df.columns.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*))

  /** Attach a `tiebreak` column unless the input already has one. */
  def ensure(df: DataFrame): DataFrame =
    if (df.columns.contains("tiebreak")) df
    else df.withColumn("tiebreak", synth(df))
}
