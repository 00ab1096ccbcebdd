package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a NATIVE aggregate function — the scalable
  * replacement for `row_number().over(Window.partitionBy(g).orderBy(...))
  * <= k`.
  *
  * The window formulation shuffles and SORTS every row of a group into
  * one task before discarding all but k — a hot group (and training-data
  * group keys are invariably zipf-skewed) becomes a straggler that
  * buffers the group's entire row set. This aggregate keeps at most
  * O(k) state per group per partition: partial aggregation prunes each
  * map partition's contribution to k rows BEFORE the shuffle, merge
  * concatenates-and-prunes, so the reduce side sees ≤ k·partitions rows
  * per group no matter how hot the group is — the same discipline as
  * `min(struct)` argmin (q129), generalized from k = 1 to arbitrary k.
  *
  * Ordering is (key DESC, id ASC) — the unique id makes the order total,
  * so the kept set and its order are deterministic under any
  * partitioning (the blanket tiebreak rule every gated query follows).
  * Result: `array<struct<key, id>>` in rank order; callers explode it
  * (compared queries never emit ARRAY columns).
  */
case class TopKLongPairs(key: Expression, id: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k >= 1, s"top-k needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(key, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKLongPairs.entryType,
    containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    // null keys/ids sort nowhere deterministic — skip them (SQL aggregate
    // null semantics)
    if (kv != null && iv != null) {
      buf.add(kv.asInstanceOf[Long], iv.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.addAll(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val top = buf.sortedTop
    new GenericArrayData(top.map { case (kv, iv) =>
      InternalRow(kv, iv)
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(b: Array[Byte]): TopKBuffer =
    TopKBuffer.fromBytes(k, b)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKLongPairs =
    copy(key = newChildren(0), id = newChildren(1))
}

object TopKLongPairs {
  val entryType: StructType = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("id", LongType, nullable = false)))
}

/** Mutable bounded buffer: appends amortize into a sort-and-prune once
  * the scratch space reaches 4k, so per-row cost is O(log k) amortized
  * and memory is O(k) — never the group size.
  */
final class TopKBuffer(val k: Int) {
  private var keys = new Array[Long](math.min(4 * k, k + 64))
  private var ids = new Array[Long](keys.length)
  private var n = 0

  def add(kv: Long, iv: Long): Unit = {
    if (n == keys.length) prune()
    if (n == keys.length) grow()
    keys(n) = kv; ids(n) = iv; n += 1
  }

  def addAll(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { add(other.keys(i), other.ids(i)); i += 1 }
  }

  // (key DESC, id ASC) total order
  private def lt(i: Int, j: Int): Boolean =
    keys(i) > keys(j) || (keys(i) == keys(j) && ids(i) < ids(j))

  /** Sort in place and truncate to the k best. */
  private def prune(): Unit = {
    val idx = Array.range(0, n).sortWith(lt)
    val nk = new Array[Long](keys.length)
    val ni = new Array[Long](keys.length)
    val keep = math.min(k, n)
    var i = 0
    while (i < keep) { nk(i) = keys(idx(i)); ni(i) = ids(idx(i)); i += 1 }
    keys = nk; ids = ni; n = keep
  }

  private def grow(): Unit = {
    // only reachable when k + 64 < pruned size needs room, i.e. k itself
    // fills the scratch — double up to 4k
    val cap = math.max(keys.length * 2, 4 * k)
    keys = java.util.Arrays.copyOf(keys, cap)
    ids = java.util.Arrays.copyOf(ids, cap)
  }

  def sortedTop: Array[(Long, Long)] = {
    prune()
    Array.tabulate(n)(i => (keys(i), ids(i)))
  }

  def toBytes: Array[Byte] = {
    prune() // ship at most k entries per partial
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(keys(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getLong); i += 1 }
    buf
  }
}

object TopKFunctions {

  /** `array<struct<key,id>>` of the k largest (key, id) pairs by
    * (key DESC, id ASC) — see [[TopKLongPairs]].
    */
  def topkPairs(key: Column, id: Column, k: Int): Column =
    GraftShim.column(TopKLongPairs(
      GraftShim.expression(key.cast("long")),
      GraftShim.expression(id.cast("long")), k)
      .toAggregateExpression())

  /** Per-group top-k rows, exploded to (group..., rnk, key, id) — the
    * drop-in for `row_number().over(partitionBy(group).orderBy(key desc,
    * id)) <= k` without the hot-group window straggler.
    *
    * The partial (map-side) combine is an EXPLICIT `mapPartitions`
    * hash-combiner, not the aggregate itself: `TypedImperativeAggregate`
    * runs under `ObjectHashAggregateExec`, which abandons hash
    * aggregation after `spark.sql.objectHashAggregate.sortBased.
    * fallbackThreshold` (default 128!) distinct groups per partition and
    * SORTS the remaining input — measured on the `topk_hot_group` scale
    * shape: 45.5 s at 100M rows under the default threshold vs 1.9 s
    * with the fallback disabled (per-row ratio 2.75 vs 0.10). An
    * operator cannot depend on a session config for its complexity
    * class, so the one place Spark's built-in physical operators cannot
    * express a bounded-state partial combine is done per-partition by
    * hand (the brief's sanctioned last resort): one linear scan, state ≤
    * min(groups-in-partition, `maxCombinerGroups`) × k. Exactness is
    * unconditional — per-group top-k of a union is the top-k of the
    * parts' top-ks, and that also licenses the combiner's OVERFLOW
    * FLUSH: when a partition holds more distinct groups than
    * `maxCombinerGroups` (a 10⁶-token vocabulary × 32 concurrent tasks
    * overran the shared local heap before this bound existed), the
    * combiner emits its current buffers and restarts; the flushed
    * partials simply merge downstream like another partition's. The
    * merge (≤ flushes × groups × k rows) still runs through the
    * [[TopKLongPairs]] aggregate. The default bound (2¹⁵) costs ≤ ~25 MB
    * per task at k ≤ 10 — pruning degrades only on
    * adversarially-interleaved ultra-wide group sets, and only to the
    * aggregate's own exact semantics.
    */
  def topkPerGroup(df: DataFrame, groupCols: Seq[Column], key: Column,
                   id: Column, k: Int,
                   maxCombinerGroups: Int = 1 << 15): DataFrame = {
    require(maxCombinerGroups >= 1,
      s"maxCombinerGroups must be >= 1, got $maxCombinerGroups")
    val proj = df.select(struct(groupCols: _*).as("g"),
      key.cast("long").as("k"), id.cast("long").as("id"))
    val schema = proj.schema
    val partial = proj.mapPartitions { it =>
      val acc = scala.collection.mutable.HashMap.empty[Row, TopKBuffer]
      def drain(): Iterator[Row] = {
        val out = acc.toArray
        acc.clear()
        out.iterator.flatMap { case (g, buf) =>
          buf.sortedTop.iterator.map { case (kv, iv) => Row(g, kv, iv) }
        }
      }
      val batches = it.flatMap { r =>
        if (!r.isNullAt(1) && !r.isNullAt(2)) {
          val g = r.getStruct(0)
          val flush = !acc.contains(g) && acc.size >= maxCombinerGroups
          val pre = if (flush) drain() else Iterator.empty
          acc.getOrElseUpdate(g, new TopKBuffer(k))
            .add(r.getLong(1), r.getLong(2))
          pre
        } else Iterator.empty
      }
      batches ++ new Iterator[Row] {
        private var inner: Iterator[Row] = null
        private def tail: Iterator[Row] = {
          if (inner == null) inner = drain()
          inner
        }
        def hasNext: Boolean = tail.hasNext
        def next(): Row = tail.next()
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    partial.groupBy("g")
      .agg(topkPairs(col("k"), col("id"), k).as("__top"))
      .select(col("g"), posexplode(col("__top")))
      .select(col("g.*"), (col("pos") + 1).cast("long").as("rnk"),
        col("col.key").as("key"), col("col.id").as("id"))
  }
}
