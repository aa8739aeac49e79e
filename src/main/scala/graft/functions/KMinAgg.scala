package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded k-minimum-values aggregate: `k_min(h, k)` returns the at most
  * `k` smallest DISTINCT BIGINT values of `h` as a sorted ascending
  * array — semantically identical to
  * `slice(array_sort(collect_set(h)), 1, k)` (nulls skipped), which is
  * the KMV sketch state ([[graft.operators.IncrementalAgg]]).
  *
  * The point is the STATE BOUND: collect_set holds every distinct value
  * of a group in memory before the slice throws all but k away — at
  * billions of distinct hashes per group (the 100 TB cardinality-
  * estimation case) that is the aggregation buffer blowing up, not a
  * sketch. This buffer never holds more than k longs: a value enters
  * only if it beats the current kth-smallest, and the partial-aggregate
  * (map-side) buffers obey the same cap, so shuffled partial state is
  * ≤ k longs per (group × partition) by construction.
  *
  * Merge is the same capped insert, so partial states combine exactly
  * (the k smallest of a union are the k smallest of the merged k
  * smallests) — associative, commutative, and equal to the unbounded
  * path bit for bit, which KMinAggSpec pins against the collect_set
  * formulation.
  */
case class KMinHashes(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0 && k <= (1 << 20), s"k_min: k out of range: $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  /** Capped distinct insert: reject values that cannot enter the k
    * smallest; evict the largest when a better one lands. `add` returns
    * false for duplicates, so the evict fires only on real growth. */
  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last && buf.add(v)) { buf.pollLast(); () }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator() // TreeSet iterates ascending
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong)
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"k_min expects a BIGINT hash column, got ${other.catalogString}")
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinHashes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinHashes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinHashes =
    copy(child = newChild)

  override def prettyName: String = "k_min"
}
