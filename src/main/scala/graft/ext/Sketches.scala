package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregation sketches — the sub-linear-memory path for
  * statistics that are exact-but-expensive at 100 TB. Exact counterparts
  * exist in the query set (q19 exact distinct, q33 exact percentiles);
  * these are the forms whose state is CONSTANT per group regardless of
  * input size, so a 1000-executor aggregation never spills:
  *
  *  - HyperLogLog++ distinct counts (`approx_count_distinct`, rsd-tunable)
  *  - KLL-ish quantile sketch (`percentile_approx`, accuracy-tunable)
  *
  * Both are Spark built-ins (Catalyst `ImperativeAggregate`s with partial
  * merge), so they combine map-side and shuffle fixed-size sketch state,
  * not rows. Sketch outputs are implementation-defined, hence tested by
  * error bound against the exact answers rather than oracle-hashed.
  */
object Sketches {

  /** Distinct values per group with bounded relative standard deviation. */
  def approxDistinct(df: DataFrame, groupCol: String, valueCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCol)
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Approximate percentiles per group; `accuracy` trades memory for
    * error (err <= 1/accuracy of the rank).
    */
  def approxPercentiles(df: DataFrame, groupCol: String, valueCol: String,
                        percentiles: Seq[Double],
                        accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCol)
      .agg(percentile_approx(col(valueCol),
        array(percentiles.map(lit): _*), lit(accuracy)).as("approx_pcts"))

  /** Count-min-sketch frequency bounds per key: build the sketch in one
    * pass (fixed ceil(2/eps)-wide counter rows, partial-merged), probe it
    * per key via the codegen'd reference-object expression, and emit the
    * CMS guarantee as flags: exact <= estimate (always — CMS only
    * overestimates) and estimate <= exact + ceil(eps·N) (with the
    * sketch's confidence). Counter updates commute, so for a fixed seed
    * the flags are deterministic under any partitioning — gateable by a
    * TRUE-asserting oracle (the q69 pattern), with the exact counts
    * riding along hash-compared.
    */
  def cmsBounds(df: DataFrame, keyCol: String, eps: Double,
                confidence: Double, seed: Int): DataFrame = {
    val cms = df.stat.countMinSketch(col(keyCol), eps, confidence, seed)
    val slack = math.ceil(eps * cms.totalCount()).toLong
    val est = graft.functions.BloomFunctions
      .cmsEstimateLong(col(keyCol), cms)
    // A null key can't be sketched (the builder skips nulls and the
    // probe is null-safe → NULL estimate): its group keeps the exact
    // count and trivially-true flags, instead of NULL flags that would
    // break a TRUE-asserting gate.
    df.groupBy(keyCol).agg(count(lit(1)).as("n_exact"))
      .select(col(keyCol), col("n_exact"),
        when(col(keyCol).isNull, lit(1L))
          .otherwise((est >= col("n_exact")).cast("long")).as("lower_ok"),
        when(col(keyCol).isNull, lit(1L))
          .otherwise((est <= col("n_exact") + slack).cast("long"))
          .as("upper_ok"))
  }
}
