package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_contains(value, bloom_b64)` — the codegen'd might-contain
  * probe over a serialized `org.apache.spark.util.sketch.BloomFilter`
  * (the exact sketch Spark's own InjectRuntimeFilter builds for runtime
  * semi-join pruning; built here by
  * [[graft.operators.BloomPrune.sketchBloomBytes]], i.e. putLong
  * semantics over a BIGINT key column).
  *
  * The sketch travels as a base64 CONSTRUCTOR field, not a child
  * literal: a child binary literal would print its full hex into every
  * explain/plan-shape string (hundreds of KB for a corpus-scale index
  * bloom), while a constructor field lets [[stringArgs]] summarize it.
  * Codegen pins the deserialized filter once as a reference object —
  * per row the probe is two hashes + two bit tests, inside
  * whole-stage codegen.
  *
  * One-sided by construction: every key that was put returns true (no
  * false negatives), a non-member returns true with probability ~fpp —
  * so `where(bloom_contains(...))` in front of an exact semi-join never
  * changes the join's result, only how many rows reach its shuffle.
  */
case class BloomContainsLong(child: Expression, bloomB64: String)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_contains expects a BIGINT input, got ${child.dataType.catalogString}")

  @transient private lazy val filter: BloomFilter =
    graft.operators.BloomPrune.deserialize(
      java.util.Base64.getDecoder.decode(bloomB64))

  override protected def nullSafeEval(value: Any): Any =
    filter.mightContainLong(value.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  /** Keep plans readable: print the sketch's size, never its payload. */
  override protected def stringArgs: Iterator[Any] =
    Iterator(child, s"<bloom:${bloomB64.length / 4 * 3}B>")

  override protected def withNewChildInternal(newChild: Expression): BloomContainsLong =
    copy(child = newChild)
}
