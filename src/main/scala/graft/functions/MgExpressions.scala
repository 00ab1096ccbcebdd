package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** Misra–Gries heavy-hitters summary as a NATIVE mergeable aggregate —
  * the deterministic-GUARANTEE sketch for hot-key detection: after any
  * sequence of updates and merges over n rows with at most k−1
  * counters, every key whose true frequency exceeds n/k is present in
  * the summary, and each kept counter underestimates its key's true
  * count by at most n/k (Misra & Gries 1982; mergeability per Agarwal
  * et al. 2012 — merge sums counters, then subtracts the k-th largest
  * value and drops the non-positive remainder).
  *
  * The SUMMARY CONTENT is partition-order-dependent (like any MG run),
  * so gated queries never emit it: they emit the EXACT counts of the
  * true heavy hitters and use the summary only to fail loud if the
  * guarantee is violated (candidate-set membership — true by theorem
  * on every run, so the gate is result-invisible). State is O(k) per
  * group per partition; the shuffle carries one ≤ (k−1)-entry summary
  * per partition.
  */
case class MisraGriesLong(child: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer] {

  require(k >= 2, s"Misra-Gries needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(MisraGriesLong.entryType,
    containsNull = false)
  override def prettyName: String = "graft_misra_gries"

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: MgBuffer): Any = {
    // (cnt DESC, key ASC) for a stable read; the content is still
    // partition-order-dependent — callers gate, never emit
    val out = buf.entries.sortBy { case (key, cnt) => (-cnt, key) }
    new GenericArrayData(out.map { case (key, cnt) =>
      InternalRow(key, cnt)
    })
  }

  override def serialize(buf: MgBuffer): Array[Byte] = buf.toBytes
  override def deserialize(b: Array[Byte]): MgBuffer =
    MgBuffer.fromBytes(k, b)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesLong =
    copy(child = newChildren(0))
}

object MisraGriesLong {
  val entryType: StructType = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false)))
}

/** At most k−1 weighted counters with the MG decrement discipline. */
final class MgBuffer(val k: Int) {
  private val m = scala.collection.mutable.HashMap.empty[Long, Long]

  /** MG weighted update: insert/increment, else decrement-all by the
    * overflow weight (the weighted generalization used by merges).
    */
  def add(key: Long, w: Long): Unit = {
    // Iterative (not recursive) so the termination bound is in the
    // structure: a decrement round either exhausts `rem` (dec = rem)
    // or frees at least one slot (dec = some counter's value), and a
    // freed slot makes the next pass take the insert branch — so the
    // loop runs at most three passes regardless of w or k.
    var rem = w
    while (rem > 0) {
      m.get(key) match {
        case Some(c) => m(key) = c + rem; rem = 0
        case None if m.size < k - 1 => m(key) = rem; rem = 0
        case None =>
          // decrement everything by min(rem, smallest counter):
          // classic MG decrements by 1 per excess arrival; weighted
          // form decrements by the smallest amount that frees a slot
          // or exhausts rem
          val dec = math.min(rem, m.values.min)
          m.mapValuesInPlace((_, c) => c - dec)
          m.filterInPlace((_, c) => c > 0)
          rem -= dec
      }
    }
  }

  /** Mergeable-summaries merge: sum counters, then if over capacity
    * subtract the k-th largest value and drop non-positive counters.
    */
  def mergeIn(other: MgBuffer): Unit = {
    other.m.foreach { case (key, c) =>
      m(key) = m.getOrElse(key, 0L) + c
    }
    if (m.size > k - 1) {
      val kth = m.values.toArray.sorted(Ordering[Long].reverse).apply(k - 1)
      m.mapValuesInPlace((_, c) => c - kth)
      m.filterInPlace((_, c) => c > 0)
    }
  }

  def entries: Array[(Long, Long)] = m.toArray

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * m.size)
    bb.putInt(m.size)
    m.foreach { case (key, c) => bb.putLong(key); bb.putLong(c) }
    bb.array()
  }
}

object MgBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MgBuffer(k)
    var i = 0
    while (i < n) {
      val key = bb.getLong; val c = bb.getLong
      buf.add(key, c) // within-capacity inserts, no decrements
      i += 1
    }
    buf
  }
}

object MgFunctions {
  /** `array<struct<key, cnt>>` MG summary of a long key column. */
  def misraGries(key: Column, k: Int): Column =
    GraftShim.column(MisraGriesLong(
      GraftShim.expression(key.cast("long")), k).toAggregateExpression())
}
