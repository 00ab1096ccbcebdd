package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Water-filling (capacity-capped leveling) allocation: spend
    * `budget` units across slices as EVENLY as availability allows —
    * every slice gets min(n_slice, L) with the water level L the
    * largest integer keeping the total within budget. The
    * "uniform-up-to-availability" mixture curation wants when
    * proportional allocation ([[withAllocation]]) would just mirror the
    * corpus skew it is trying to correct. Exact integer arithmetic
    * end-to-end; the level search runs on the collected per-slice
    * counts (slice cardinality is a bounded mixture dimension — the
    * O(k) model-read discipline). Returns
    * (slice, n, alloc, level, leftover): Σalloc = min(budget, Σn) −
    * leftover with leftover < #unsaturated slices (the sub-level
    * remainder is deliberately NOT distributed — callers wanting
    * exact exhaustion top up by slice order explicitly).
    */
  def waterFill(perSlice: DataFrame, sliceCol: String, nCol: String,
                budget: Long, maxSlices: Int = 100000): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val spark = perSlice.sparkSession
    import spark.implicits._
    val counts = perSlice.select(col(sliceCol).cast("string"),
        col(nCol).cast("long"))
      .as[(String, Long)].collect().sortBy(_._1)
    require(counts.length <= maxSlices,
      s"waterFill: ${counts.length} slices exceed maxSlices=$maxSlices")
    require(counts.forall(_._2 >= 0), "waterFill: negative slice count")
    val sorted = counts.map(_._2).sorted
    val k = sorted.length
    // walk the sorted breakpoints: with the i smallest slices saturated
    // (cum tokens), the level for the remaining k-i slices is
    // (budget - cum) div (k - i); it is the TRUE level iff it lands in
    // [sorted(i-1), sorted(i)) — i.e. saturates exactly those i.
    var level = 0L
    var cum = 0L
    var found = false
    for (i <- 0 until k if !found) {
      val cand = (budget - cum) / (k - i)
      if (cand < sorted(i)) {
        level = math.max(cand, 0L)
        found = true
      } else cum += sorted(i)
    }
    if (!found) level = if (k == 0) 0L else sorted.last // budget >= Σn
    val alloc = counts.map { case (s, n) => math.min(n, level) }
    val leftover = math.min(budget, counts.map(_._2).sum) - alloc.sum
    val rows = counts.zip(alloc).map { case ((s, n), a) =>
      (s, n, a, level, leftover)
    }
    spark.createDataset(rows.toSeq)
      .toDF(sliceCol, "n", "alloc", "level", "leftover")
  }

  /** Exact integer square root: ⌊√n⌋ for n ≥ 0, as a column program —
    * a float sqrt seed corrected by ±1 integer steps, so the result is
    * exact for any BIGINT even where the double rounds (both engines
    * run the identical seed-and-correct, so it is hash-portable where
    * bare floor(sqrt) is not).
    */
  def isqrt(n: Column): Column = {
    // The seed's worst-case error is < 1 (double(n) is within 2¹⁰ of n
    // near 2⁶³; sqrt amplifies that to ~2e-7), so ±1 correction is
    // complete. The square compares run in decimal(38,0) because
    // (s+1)² exceeds 2⁶³ for n near Long.MaxValue — BIGINT would wrap
    // silently in Spark and ERROR in DuckDB (HUGEINT on that side).
    val s0 = floor(sqrt(n.cast("double"))).cast("long")
    def sq(x: Column) = x.cast("decimal(38,0)") * x.cast("decimal(38,0)")
    val nd = n.cast("decimal(38,0)")
    val up = s0 + when(sq(s0 + 1) <= nd, 1L).otherwise(0L)
    up - when(sq(up) > nd, 1L).otherwise(0L)
  }

  /** Temperature-scaled mixture weights + allocation — the DoReMi /
    * Pile-style domain reweighting w_i ∝ n_i^(1/T), kept on the exact
    * integer grid by restricting 1/T to {1/2, 1, 2}: T = 2 flattens
    * the skew via the integer square root ([[isqrt]] — exact even
    * where float sqrt rounds), T = 1 is proportional, T = 1/2
    * sharpens it via exact squares. The weight table is integers on
    * both engines; the budget split over it reuses
    * [[withAllocation]]'s largest-remainder method (doubles only in
    * the bit-portable mult→floor→compare shape). `invT2` is 2/T, so
    * 1 → isqrt, 2 → identity, 4 → square.
    *
    * Returns `perSlice` + (`weight`, `alloc`): Σalloc == budget
    * exactly. Same scale shape as [[withAllocation]] — runs on the
    * already-aggregated per-slice table (mixture dimensions are
    * dozens, not millions; the corpus-sized token count happens
    * before, as a plain combinable aggregate).
    */
  def temperatureAllocation(perSlice: DataFrame, sliceCol: String,
                            nCol: String, budget: Long,
                            invT2: Int): DataFrame = {
    require(Set(1, 2, 4).contains(invT2),
      s"invT2 must be 1 (T=2), 2 (T=1), or 4 (T=1/2), got $invT2")
    val n = col(nCol)
    val w = invT2 match {
      case 1 => isqrt(n)
      case 2 => n.cast("long")
      // exact-square weights can pass 2⁶³ for BIGINT token counts:
      // widen to decimal(38,0) (withAllocation only reads the weight
      // through a double cast, which is shape-portable either way)
      case 4 => (n.cast("decimal(38,0)") * n.cast("decimal(38,0)"))
    }
    withAllocation(perSlice.withColumn("weight", w),
      sliceCol, "weight", budget)
  }
}
