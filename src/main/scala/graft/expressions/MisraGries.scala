package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter candidates as a real aggregate function
  * (Misra & Gries 1982; mergeable form per Agarwal et al., "Mergeable
  * Summaries", PODS 2012).
  *
  * Keeps at most k counters per aggregation buffer. The guarantee that
  * makes it useful at 100 TB: every item whose true frequency exceeds
  * n/k is PRESENT in the summary (each counter undercounts by at most
  * n/k), and the summary merges associatively — partial aggregation
  * ships ≤ k (term, count) pairs per map task into the shuffle instead
  * of the full distinct-key space. The candidate SET depends on
  * arrival/merge order (only the superset guarantee is deterministic),
  * so callers must verify candidates with an exact second pass before
  * emitting counts — see Sketches.textHeavyHitters, the classic
  * two-pass exact heavy-hitters pattern this aggregate exists for.
  *
  * eval returns the candidate terms sorted lexicographically.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"misra_gries expects string, got ${child.dataType}")

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buffer: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MgBuffer, other: MgBuffer): MgBuffer = {
    buffer.mergeWith(other); buffer
  }

  override def eval(buffer: MgBuffer): Any =
    new GenericArrayData(buffer.terms.sorted.map(UTF8String.fromString(_)))

  override def serialize(buffer: MgBuffer): Array[Byte] = buffer.toBytes
  override def deserialize(storageFormat: Array[Byte]): MgBuffer = MgBuffer.fromBytes(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** Bounded k-counter Misra–Gries summary. */
final class MgBuffer(val k: Int) {
  private[expressions] val counts = scala.collection.mutable.HashMap.empty[String, Long]

  def add(t: String): Unit = addWeighted(t, 1L)

  private def addWeighted(t: String, w: Long): Unit = {
    counts.get(t) match {
      case Some(c) => counts.update(t, c + w)
      case None =>
        if (counts.size < k) counts.update(t, w)
        else {
          // decrement step: the incoming weight and every stored counter
          // shed min(w, smallest counter) together; repeat until the
          // item fits or its weight is exhausted
          var rem = w
          while (rem > 0 && !counts.contains(t)) {
            val m = math.min(rem, counts.valuesIterator.min)
            rem -= m
            counts.mapValuesInPlace((_, c) => c - m)
            counts.filterInPlace((_, c) => c > 0)
            if (rem > 0 && counts.size < k) counts.update(t, rem)
          }
        }
    }
    ()
  }

  /** Mergeable-summaries reduction: pointwise sum, then subtract the
    * (k+1)-th largest count from every counter and drop the non-positive
    * remainder — total error stays ≤ n/k across the merge tree.
    */
  def mergeWith(other: MgBuffer): Unit = {
    other.counts.foreach { case (t, c) =>
      counts.update(t, counts.getOrElse(t, 0L) + c)
    }
    if (counts.size > k) {
      val kth = counts.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      counts.mapValuesInPlace((_, c) => c - kth)
      counts.filterInPlace((_, c) => c > 0)
    }
  }

  def terms: Array[String] = counts.keysIterator.toArray
  def size: Int = counts.size

  def toBytes: Array[Byte] = {
    val entries = counts.toArray.map { case (t, c) => (t.getBytes(StandardCharsets.UTF_8), c) }
    val bb = ByteBuffer.allocate(8 + entries.map(_._1.length + 12).sum)
    bb.putInt(k); bb.putInt(entries.length)
    entries.foreach { case (b, c) => bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }
}

object MgBuffer {
  def fromBytes(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MgBuffer(bb.getInt)
    val n = bb.getInt
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.counts.update(new String(b, StandardCharsets.UTF_8), bb.getLong)
    }
    buf
  }
}
