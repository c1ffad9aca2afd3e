package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Top-k ids per group as a real aggregate function.
  *
  * `window row_number() ≤ k` computes top-k by fully sorting every
  * group after a full shuffle. This aggregate keeps a bounded k-entry
  * heap instead, and because it's an aggregate it PARTIAL-aggregates
  * map-side: each input partition ships at most k entries per group
  * into the shuffle — at 100 TB that's the difference between shuffling
  * the fact table and shuffling k rows per key.
  *
  * Semantics: ids of the k largest `ord` values, ordered ord desc with
  * id asc tiebreak (deterministic, matches the window formulation).
  */
case class TopKIds(
    ord: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(ord, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "top_k_ids"

  override def checkInputDataTypes(): TypeCheckResult =
    if (ord.dataType == DoubleType && id.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"top_k_ids expects (double, bigint), got (${ord.dataType}, ${id.dataType})")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null) buffer.insert(o.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeWith(other); buffer
  }

  override def eval(buffer: TopKBuffer): Any = new GenericArrayData(buffer.sortedIds)

  override def serialize(buffer: TopKBuffer): Array[Byte] = buffer.toBytes
  override def deserialize(storageFormat: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKIds =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKIds =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(ord = newChildren(0), id = newChildren(1))
}

/** Bounded top-k buffer: keeps the k best (ord desc, id asc) pairs. */
final class TopKBuffer(val k: Int) {
  // min-heap on (ord asc, id desc) so the worst kept entry is on top
  private val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
    Ordering.by[(Double, Long), (Double, Long)] { case (o, i) => (-o, i) })

  private def worseThanTop(o: Double, i: Long): Boolean = {
    val (to, ti) = heap.head
    o < to || (o == to && i > ti)
  }

  def insert(o: Double, i: Long): Unit =
    if (heap.size < k) heap.enqueue((o, i))
    else if (!worseThanTop(o, i)) { heap.dequeue(); heap.enqueue((o, i)) }

  def mergeWith(other: TopKBuffer): Unit = other.heap.foreach { case (o, i) => insert(o, i) }

  /** ids ordered by (ord desc, id asc). */
  def sortedIds: Array[Long] =
    heap.toArray.sortBy { case (o, i) => (-o, i) }.map(_._2)

  def toBytes: Array[Byte] = {
    val entries = heap.toArray
    val bb = ByteBuffer.allocate(8 + entries.length * 16)
    bb.putInt(k); bb.putInt(entries.length)
    entries.foreach { case (o, i) => bb.putDouble(o); bb.putLong(i) }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt)
    val n = bb.getInt
    (0 until n).foreach(_ => buf.insert(bb.getDouble, bb.getLong))
    buf
  }
}
