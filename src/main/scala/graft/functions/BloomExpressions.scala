package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

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
}
