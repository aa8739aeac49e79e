package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints (Schleimer et al.'s local algorithm,
  * cited in SURVEY.md §7.6): hash every char k-gram of the text
  * (md5-derived 28-bit, [[Md5Hash]] — the oracle-portable scheme), slide
  * a w-hash window, keep each window's minimum; the SORTED DISTINCT
  * minima are the document's fingerprint set. Texts with no full window
  * (fewer than k+w−1 chars) return an empty array.
  *
  * Replaces the exploded-grams shape (posexplode → count window →
  * sliding-min window → collect_set): that plan multiplies every doc
  * into ~len(text) rows and pays one shuffle plus two window sorts per
  * doc. Here the whole algorithm is ONE codegen'd map call per row —
  * O(len) via a monotonic deque — so at 100 TB it fuses into the scan
  * with zero shuffle (the shape every per-document sketch in this
  * library follows).
  *
  * Bit-identical to the exploded shape and to the DuckDB oracle: gram
  * hashes are the same md5 prefixes over the same CHARACTER-based
  * substrings, and min/distinct/sort over longs has no ordering
  * subtlety.
  *
  * Registered as SQL function `winnow_fps(text, k, w)` by
  * [[GraftExtensions]].
  */
case class WinnowFps(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k > 0 && w > 0, "winnow_fps: k and w must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    WinnowOps.eval(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // WinnowOps is an object WITHOUT a companion class — Janino needs a
    // java-static call (see the Md5Prefix/VecDot codegen note).
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowOps.eval($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)

  override def prettyName: String = "winnow_fps"
}

/** Static evaluation helper for [[WinnowFps]] — deliberately NOT the
  * case class's companion (codegen static-call note). */
object WinnowOps {
  def eval(text: UTF8String, k: Int, w: Int): ArrayData = {
    val chars = text.numChars()
    val nGrams = chars - k + 1
    val nWindows = nGrams - w + 1
    if (nWindows <= 0) return new GenericArrayData(Array.emptyLongArray)

    // 28-bit md5 prefix of each char k-gram (matches md5_prefix(s, 7)).
    val h = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) { h(i) = Md5Hash.eval(text.substringSQL(i + 1, k), 7); i += 1 }

    // Sliding-window minima via a monotonic deque (indices, increasing
    // hash values); distinct + sorted via a TreeSet (fingerprint sets
    // are tiny relative to the text).
    val minima = new java.util.TreeSet[java.lang.Long]()
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // deque is [head, tail)
    i = 0
    while (i < nGrams) {
      while (tail > head && h(deque(tail - 1)) >= h(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) minima.add(h(deque(head)))
      i += 1
    }
    val out = new Array[Long](minima.size())
    val it = minima.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}
