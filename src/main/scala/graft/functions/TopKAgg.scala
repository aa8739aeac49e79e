package graft.functions

import java.nio.ByteBuffer
import java.util.Comparator

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k aggregate: `top_k_pairs(id, score, k)`
  * returns the k highest-scoring (id BIGINT, score DOUBLE) pairs of the
  * group as an array of structs in rank order — score DESC, id ASC on
  * ties — semantically identical to
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, id) <= k`.
  *
  * The point is the same as [[KMinHashes]]: a rank window SORTS every
  * candidate row of a group (the per-qid candidate sort is the dominant
  * shuffle+sort of the ANN queries at scale — millions of candidates
  * per partition); this buffer never holds more than k (score, id)
  * pairs, map-side partials included, and merges exactly (the top k of
  * a union are the top k of the merged top-ks).
  *
  * Caveats pinned by TopKAggSpec:
  *  - input pairs must be DISTINCT within a group (true for every ANN
  *    candidate generator here: each (qid, nid) appears at most once);
  *    a duplicated pair would collapse where the window counts it twice;
  *  - ±0.0 compare EQUAL for ordering (the id breaks the tie), matching
  *    SQL comparison semantics, while the stored score stays raw so the
  *    emitted value is exactly what a window would carry;
  *  - NaN sorts above everything, matching Spark/DuckDB `DESC`. */
case class TopKPairs(
    idChild: Expression,
    scoreChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]]
  with BinaryLike[Expression] {

  require(k > 0 && k <= (1 << 20), s"top_k_pairs: k out of range: $k")

  override def left: Expression = idChild
  override def right: Expression = scoreChild

  /** Rank order: score DESC (NaN first, like SQL DESC), id ASC. The
    * TreeSet's FIRST element is rank 1; `last` is the current cutoff.
    * −0.0 is normalized INSIDE the comparison only (SQL ordering treats
    * ±0.0 equal and breaks the tie on id); the stored score stays raw,
    * so the emitted value is bit-identical to what a rank window would
    * carry through. */
  private object RankOrder extends Comparator[(Double, Long)] with Serializable {
    private def norm(d: Double): Double = if (d == 0.0) 0.0 else d
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(norm(b._1), norm(a._1)) // desc
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](RankOrder)

  private def insert(buf: java.util.TreeSet[(Double, Long)], id: Long, score: Double): Unit = {
    val pair = (score, id)
    if (buf.size < k) { buf.add(pair); () }
    else if (RankOrder.compare(pair, buf.last) < 0 && buf.add(pair)) { buf.pollLast(); () }
  }

  override def update(buf: java.util.TreeSet[(Double, Long)],
                      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val id = idChild.eval(input)
    val sc = scoreChild.eval(input)
    if (id != null && sc != null)
      insert(buf, id.asInstanceOf[Long], sc.asInstanceOf[Double])
    buf
  }

  override def merge(buf: java.util.TreeSet[(Double, Long)],
                     other: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) { val p = it.next(); insert(buf, p._2, p._1) }
    buf
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val p = it.next()
      out(i) = InternalRow(p._2, p._1)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val p = it.next(); bb.putDouble(p._1); bb.putLong(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) { val s = bb.getDouble; val id = bb.getLong; buf.add((s, id)) }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = (idChild.dataType, scoreChild.dataType) match {
    case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (a, b) => TypeCheckResult.TypeCheckFailure(
      s"top_k_pairs expects (BIGINT id, DOUBLE score), got (${a.catalogString}, ${b.catalogString})")
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TopKPairs =
    copy(idChild = newLeft, scoreChild = newRight)

  override def prettyName: String = "top_k_pairs"
}
