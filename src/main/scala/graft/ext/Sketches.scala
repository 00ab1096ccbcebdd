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
}
