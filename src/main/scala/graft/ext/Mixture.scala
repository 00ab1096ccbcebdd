package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mixture-recipe budgeting: divide a fixed token budget across corpus
  * sources proportionally to their weights, with exact integer totals via
  * the largest-remainder (Hamilton) method — each source gets
  * floor(budget * share), and the leftover units go to the sources with
  * the largest fractional parts (ties broken by group name). The result
  * always sums to exactly `budget`, which per-source rounding cannot
  * guarantee.
  *
  * Operates on the already-aggregated per-group table (one row per
  * source), which is small by construction — a corpus has dozens of
  * sources, not millions — so the unpartitioned windows here are cheap by
  * design; the heavy work (summing tokens per source over the corpus)
  * happens before this operator, as a plain scalable aggregate.
  */
object Mixture {

  /** Returns `perGroup` with an `out` column allocating `budget` units
    * proportionally to `weightCol` (non-negative numeric); sum(out) ==
    * budget exactly.
    *
    * All arithmetic is double mult -> floor -> integer compare, each step
    * correctly rounded identically in any IEEE-754 engine, so the DuckDB
    * oracle reproduces the allocation bit-for-bit.
    *
    * A zero (or empty) total weight has no proportional answer: rather
    * than let 0*budget/0 = NaN flow into floor() and emit garbage
    * allocations silently, every group short-circuits to `out` = 0 — the
    * only allocation consistent with "each share is proportional to its
    * weight" when all weights are 0.
    */
  def withAllocation(perGroup: DataFrame, groupCol: String,
                     weightCol: String, budget: Long,
                     out: String = "alloc"): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val all = Window.partitionBy()
    perGroup
      .withColumn("__exact",
        when(sum(col(weightCol)).over(all) <= 0, lit(0.0))
          .otherwise(col(weightCol).cast("double") * budget /
            sum(col(weightCol)).over(all)))
      .withColumn("__base", floor(col("__exact")))
      .withColumn("__rk", row_number().over(
        Window.orderBy((col("__exact") - col("__base")).desc,
          col(groupCol).asc)))
      .withColumn(out,
        // The largest-remainder top-up only applies when there IS a
        // proportional base; under the zero-total short-circuit the
        // leftover equals the whole budget and must NOT be distributed.
        when(sum(col(weightCol)).over(all) <= 0, lit(0L))
          .otherwise(col("__base") + when(
            col("__rk") <= lit(budget) - sum(col("__base")).over(all), 1L)
            .otherwise(0L)))
      .drop("__exact", "__base", "__rk")
  }
}
