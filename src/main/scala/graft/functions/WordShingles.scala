package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column — the first stage of
  * every near-dup sketch ([[graft.text.TextDedup]]).
  *
  * Replaces the SQL shape `transform(sequence(1, size(split(c,' '))-2),
  * i -> concat_ws(' ', slice(split(c,' '), i, 3)))`: the `split` inside
  * the lambda body re-evaluates ONCE PER WINDOW (the lambda-inlining
  * rule — Catalyst inlines the alias into the lambda), making the SQL
  * stage O(words²) in the text length. Here: one split, one pass, a
  * LinkedHashSet for first-occurrence-distinct — O(len), codegen'd.
  *
  * Semantics are IDENTICAL to the SQL shape (and the DuckDB oracle's
  * str_split mirror): split on the literal single space keeping empty
  * tokens (consecutive spaces), windows of n joined by ' ', distinct in
  * first-occurrence order; fewer than n tokens → empty array.
  *
  * Registered as SQL function `word_shingles(text, n)` by
  * [[GraftExtensions]].
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0 && n <= 16, "word_shingles: n out of range")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    ShingleOps.eval(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // ShingleOps is an object WITHOUT a companion class — Janino needs a
    // java-static call (see the Md5Prefix/VecDot codegen note).
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.eval($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

/** Static evaluation helper for [[WordShingles]] — deliberately NOT the
  * case class's companion (codegen static-call note). */
object ShingleOps {
  def eval(text: UTF8String, n: Int): ArrayData = {
    // Literal-space split with trailing empties kept — exactly Spark's
    // split(c, ' ') (regex limit -1) and DuckDB's str_split.
    val words = text.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= words.length - n) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) { if (j > 0) sb.append(' '); sb.append(words(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}
