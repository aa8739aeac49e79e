package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expressions for the per-document dedup sketches
  * (SURVEY.md §7.3): MinHash signatures and 32-bit SimHash over an
  * `array<bigint>` of md5-derived shingle hashes.
  *
  * These replace the `aggregate(...)`/`zip_with(...)` folds in
  * [[graft.text.TextDedup]]: higher-order functions are CodegenFallback,
  * so the folds ran interpreted — K×/32× closure dispatches and boxed
  * longs per shingle in the hottest map stage of the dedup pipeline.
  * Each expression is one primitive loop inside whole-stage codegen and
  * stays map-only (no shuffle added; signatures still compute where the
  * scan runs — the 100 TB posture).
  *
  * The arithmetic is IDENTICAL to the fold it replaces (integer-only, so
  * there is no summation-order concern at all):
  *   minhash:  sig[j] = min over h of ((2j+1)·h + 104729j + 7919) mod P
  *   simhash:  bit i set iff strict majority of hashes set bit i
  * — the same formulas the DuckDB oracles state, so hash-matches are
  * untouched.
  */
case class MinhashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0 && k <= 1024, "minhash_sig: k out of range")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint> (pre-hashed) or array<string> (shingles), " +
        s"got ${other.catalogString}")
  }

  private def fromStrings: Boolean = child.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    if (fromStrings) SketchOps.minhashStr(input.asInstanceOf[ArrayData], k)
    else SketchOps.minhash(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // SketchOps is an object WITHOUT a companion class — Janino needs a
    // java-static call (see the Md5Prefix/VecDot codegen note).
    val fn = if (fromStrings) "minhashStr" else "minhash"
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.$fn($c, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

case class Simhash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects array<bigint> (pre-hashed) or array<string> (shingles), " +
        s"got ${other.catalogString}")
  }

  private def fromStrings: Boolean = child.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    if (fromStrings) SketchOps.simhash32Str(input.asInstanceOf[ArrayData])
    else SketchOps.simhash32(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (fromStrings) "simhash32Str" else "simhash32"
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.$fn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Simhash32 =
    copy(child = newChild)

  override def prettyName: String = "simhash32"
}

/** Static evaluation helpers for [[MinhashSig]]/[[Simhash32]] —
  * deliberately NOT case-class companions (codegen static-call note). */
object SketchOps {
  /** Largest prime < 2²⁸ — mirrors TextDedup.MinhashP. */
  val P = 268435399L

  /** Empty input → all-P sentinel signature (same as the fold's init). */
  def minhash(hashes: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, P)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      // getLong on a null slot silently reads 0, poisoning the signature
      // with hash-of-0 permutations. Dense input is the contract.
      if (hashes.isNullAt(i))
        throw new IllegalArgumentException(s"minhash_sig: null hash at index $i")
      val h = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val v = ((2L * j + 1L) * h + 104729L * j + 7919L) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** [[minhash]] fused with the hash step: input is the SHINGLE STRING
    * array; each element is hashed to its 28-bit md5 prefix
    * (≡ md5_prefix(s, 7)) inline — no intermediate hash array, no
    * interpreted `transform` dispatch. */
  def minhashStr(shingles: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, P)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val u = shingles.getUTF8String(i)
      if (u == null) throw new IllegalArgumentException(s"minhash_sig: null shingle at index $i")
      val h = Md5Hash.eval(u, 7)
      var j = 0
      while (j < k) {
        val v = ((2L * j + 1L) * h + 104729L * j + 7919L) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** [[simhash32]] fused with the hash step: input is the SHINGLE STRING
    * array; each element is hashed to its 60-bit md5 prefix
    * (≡ md5_prefix(s, 15)) inline. */
  def simhash32Str(shingles: ArrayData): Long = {
    val n = shingles.numElements()
    val cnt = new Array[Long](32)
    var i = 0
    while (i < n) {
      val u = shingles.getUTF8String(i)
      if (u == null) throw new IllegalArgumentException(s"simhash32: null shingle at index $i")
      val h = Md5Hash.eval(u, 15)
      var b = 0
      while (b < 32) { cnt(b) += (h >>> b) & 1L; b += 1 }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) { if (cnt(b) * 2 > n) out |= 1L << b; b += 1 }
    out
  }

  /** Bit i of the result set iff a STRICT majority of the (60-bit)
    * hashes have bit i set; ties → 0. Empty input → 0. */
  def simhash32(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val cnt = new Array[Long](32)
    var i = 0
    while (i < n) {
      if (hashes.isNullAt(i))
        throw new IllegalArgumentException(s"simhash32: null hash at index $i")
      val h = hashes.getLong(i)
      var b = 0
      while (b < 32) { cnt(b) += (h >>> b) & 1L; b += 1 }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) { if (cnt(b) * 2 > n) out |= 1L << b; b += 1 }
    out
  }
}
