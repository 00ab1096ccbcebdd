package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Codegen'd bloom-filter membership probe over a long key column.
  *
  * Spark's own runtime-filter expression (`BloomFilterMightContain`) is
  * `private[sql]` and only injected by the optimizer; this is the same
  * idea exposed as an operator building block. The filter rides into the
  * generated code as a REFERENCE OBJECT (the [[NearestCentroid]] pattern)
  * — one virtual call per row against executor-local bits, inside
  * whole-stage codegen, no join and no shuffle for the probe itself.
  *
  * False positives only (never false negatives): callers use it strictly
  * as a PREFILTER in front of an exact join, so results stay exact while
  * the shuffle moves only rows that might match.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("bloomFilter", filter,
        classOf[BloomFilter].getName)
      s"${ev.value} = $ref.mightContainLong($v);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}

/** Codegen'd count-min-sketch frequency estimate for a long key — the
  * same reference-object pattern as [[BloomMightContain]]: the sketch is
  * built once (one pass, driver-merged fixed-size counters), then probed
  * per row inside whole-stage codegen. CMS guarantees
  * exact <= estimate <= exact + eps·N (with the sketch's confidence), and
  * counter updates commute, so the estimate is deterministic under any
  * partitioning for a fixed seed.
  */
case class CmsEstimateLong(child: Expression, sketch: CountMinSketch)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override def nullSafeEval(input: Any): Any =
    sketch.estimateCount(input.asInstanceOf[java.lang.Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("cmsSketch", sketch,
        classOf[CountMinSketch].getName)
      s"${ev.value} = $ref.estimateCount((Object) java.lang.Long.valueOf($v));"
    })

  override protected def withNewChildInternal(
      newChild: Expression): CmsEstimateLong = copy(child = newChild)
}

object BloomFunctions {
  /** Membership probe against a pre-built filter. The key is cast to
    * long here — the expression skips ExpectsInputTypes (private[sql],
    * see GraftShim), so without the cast an int/string key would pass
    * analysis and then diverge: codegen silently widens, interpreted
    * eval ClassCastExceptions.
    */
  def mightContainLong(key: Column, filter: BloomFilter): Column =
    GraftShim.column(BloomMightContain(
      GraftShim.expression(key.cast("long")), filter))

  /** Per-row CMS frequency estimate of a long key (cast enforced here —
    * same reasoning as [[mightContainLong]]).
    */
  def cmsEstimateLong(key: Column, sketch: CountMinSketch): Column =
    GraftShim.column(CmsEstimateLong(
      GraftShim.expression(key.cast("long")), sketch))
}
