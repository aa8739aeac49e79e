package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the dense dot product of two
  * `array<double>` vectors — the hot inner loop of every similarity
  * operator (vectors × centroids in IVF assignment, vectors × planes in
  * LSH bucketing, and every candidate pair in kNN / near-dup search).
  *
  * Replaces the composed `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0,
  * +)` fold: higher-order functions are CodegenFallback in Spark, so the
  * fold runs interpreted with per-element boxing and closure dispatch;
  * this expression stays inside whole-stage codegen as one primitive
  * loop. The summation is the SAME sequential left fold
  * (((0 + a₀b₀) + a₁b₁) + …), so results are bit-identical to the fold
  * it replaces and to DuckDB's `list_dot_product` — oracle portability
  * untouched (SURVEY.md §7.4).
  *
  * Inputs must be dense (no null elements) and equal-length — embedding
  * columns by construction. Length mismatch throws rather than padding:
  * a silent null would hide a data-quality bug at 100 TB.
  *
  * Registered as SQL function `vec_dot(a, b)` by [[GraftExtensions]].
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def isVec(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (isVec(left.dataType) && isVec(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects two array<double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDotOps.eval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // NOTE: VecDotOps is an object WITHOUT a companion class — Scala only
    // emits java-static forwarders for such objects, and Janino needs a
    // static call (a companion-object method silently fails codegen and
    // falls back to interpreted eval — the round-2 md5_prefix lesson).
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecDotOps.eval($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

/** Static evaluation helper for [[VecDot]] — deliberately NOT the case
  * class's companion (see the doGenCode note). */
object VecDotOps {
  def eval(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"vec_dot: length mismatch (${n} vs ${b.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) {
      // getDouble on a null slot silently yields 0.0 — a wrong score,
      // not an error. Dense vectors are the contract; fail loud.
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"vec_dot: null element at index $i")
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}
