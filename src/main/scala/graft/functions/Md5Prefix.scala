package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the md5-derived portable hashes
  * ([[PortableHash]]): value = first `hexDigits` hex chars of md5(s),
  * read as an unsigned integer — IDENTICAL to
  * `conv(substring(md5(s), 1, hexDigits), 16, 10)` but computed straight
  * from the digest bytes, skipping the 32-char hex rendering, substring,
  * and base-16 re-parse the built-in chain allocates per call. The md5
  * digest is the same everywhere (JVM, DuckDB), so oracle portability is
  * untouched.
  *
  * This is the one hot-loop case where a custom Expression beats
  * composing built-ins (SURVEY.md §7.3): the dedup/fingerprint operators
  * hash millions of shingles per partition. Codegen emits a static call,
  * so it stays inside whole-stage codegen with no boxing.
  *
  * Registered as SQL function `md5_prefix(str, digits)` by
  * [[GraftExtensions]] (SparkSessionExtensions), usable inside
  * higher-order-function lambdas.
  */
case class Md5Prefix(child: Expression, hexDigits: Int) extends UnaryExpression {
  require(hexDigits > 0 && hexDigits <= 15, "1..15 hex digits fit a signed long")

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix expects a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    Md5Hash.eval(input.asInstanceOf[UTF8String], hexDigits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // NOTE: the helper lives in Md5Hash, an object WITHOUT a companion
    // class — Scala only emits java-static forwarders for such objects,
    // and Janino needs a static call (a companion-object method here
    // silently fails codegen and falls back to interpreted eval).
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash.eval($c, $hexDigits)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix =
    copy(child = newChild)

  override def prettyName: String = "md5_prefix"
}

/** Static evaluation helper for [[Md5Prefix]] — deliberately NOT the
  * case class's companion (see the doGenCode note). */
object Md5Hash {
  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First `hexDigits` hex chars of md5(bytes) as an unsigned long —
    * i.e. the top 4·hexDigits bits of the digest. */
  def eval(s: UTF8String, hexDigits: Int): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < hexDigits) { // one hex digit = one nibble
      val b = d(i / 2) & 0xff
      val nibble = if (i % 2 == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nibble
      i += 1
    }
    v
  }
}
