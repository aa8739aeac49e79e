package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `sorted_intersect_count(a, b)` — |a ∩ b| for two SORTED-ascending
  * DISTINCT BIGINT arrays (the canonical hashed-set form every exact
  * set-similarity operator carries: `array_sort(array_distinct(...))`
  * of 60-bit md5 hashes). Two-pointer merge, zero allocation — the
  * built-in chain `size(array_intersect(a, b))` builds a hash set AND
  * an intersection ARRAY per row pair just to take its length, in the
  * innermost loop of the jaccard/containment verify stages, where
  * every surviving candidate pair pays it.
  *
  * PRECONDITION (caller-enforced, not checked row-wise): both arrays
  * sorted ascending with distinct elements — exactly what
  * [[graft.text.TextDedup.hashedShingleSets]] produces and the
  * warehouse `doc_hashsets` artifact stores. On unsorted input the
  * count is simply wrong; the swap sites are spec-pinned equal to the
  * built-in chain on real corpus data.
  *
  * Registered as SQL function `sorted_intersect_count` by
  * [[GraftExtensions]].
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects two ARRAY<BIGINT> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectOps.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // static-call helper (the Md5Hash pattern): Janino needs a static
    // target; the loop itself is branchy enough that a JVM-compiled
    // helper beats emitted source anyway
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SortedIntersectOps.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Static evaluation helper for [[SortedIntersectCount]] — deliberately
  * NOT the case class's companion (see Md5Prefix's doGenCode note). */
object SortedIntersectOps {
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      // fail fast on null elements: the function is registered as a
      // general SQL function and the type check admits containsNull
      // arrays, so a null slot must surface as an error — getLong on a
      // null slot would silently return garbage (a wrong count). The
      // isNullAt probe is a bitset test, negligible next to getLong.
      if (a.isNullAt(i) || b.isNullAt(j))
        throw new IllegalArgumentException(
          "sorted_intersect_count: null array element — inputs must be " +
            "sorted, distinct, non-null BIGINT arrays " +
            "(array_sort(array_distinct(...)) of non-null hashes)")
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
