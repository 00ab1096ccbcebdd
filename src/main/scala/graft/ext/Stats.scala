package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-moment statistics (correlation / covariance / stddev / z-score)
  * built for cross-engine determinism AND scale.
  *
  * Floating-point `corr()`/`stddev()` aggregates are order-dependent: the
  * partial-aggregation tree sums doubles in partition order, so two runs
  * (or two engines) produce answers differing in the low bits — fine for
  * analytics, fatal for a hash-compared gate and for reproducible data
  * curation. These operators instead aggregate integer-scaled measures
  * ("cents"): the per-group sums (n, Σx, Σy, Σx², Σy², Σxy) are EXACT
  * 64-bit integers under any partitioning, and the statistics are derived
  * from those sums with one fixed double-arithmetic formula — bit-identical
  * on every engine and every cluster layout.
  *
  * Scale design: one partial-aggregated groupBy (map-side combine on the
  * six sums — constant state per group), no window, no second scan of the
  * data. The caller supplies the integer scaling (e.g.
  * `floor(x * 100 + 0.5)` for 2-decimal measures) and owns the overflow
  * budget: Σx² fits int64 while |x_cents|² × rows < 9.2e18 — at 100 TB
  * scale wide measures should be pre-scaled down or summed as
  * DECIMAL(38,0) instead.
  */
object Stats {

  /** Integer-cents helper: `floor(x * scale + 0.5)` — the engine-portable
    * round-half-up (Spark round() is BigDecimal HALF_UP, DuckDB round()
    * is scale-multiply + std::round; floor(x+0.5) is the same correctly
    * rounded IEEE op everywhere).
    */
  def cents(x: Column, scale: Int = 100): Column =
    floor(x * scale + lit(0.5)).cast("long")

  /** Per-group exact second-moment statistics of two integer measures:
    * sample covariance, sample stddevs, and Pearson correlation, plus the
    * raw exact sums. The moment formulation ((Σxy − ΣxΣy/n)/(n−1)) is used
    * on BOTH engines, so derived doubles match bit-for-bit; groups with
    * n < 2 yield null covariance/correlation (no sample variance exists).
    *
    * Output units are the CENTS units of the inputs (covariance scales
    * with scale², correlation is scale-free).
    */
  def momentStats(df: DataFrame, groupCol: String,
                  xCents: Column, yCents: Column): DataFrame = {
    val agg = df.groupBy(groupCol).agg(
      count(lit(1)).as("n"),
      sum(xCents).as("sx"), sum(yCents).as("sy"),
      sum(xCents * xCents).as("sxx"),
      sum(yCents * yCents).as("syy"),
      sum(xCents * yCents).as("sxy"))
    val nd = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val cov = (d("sxy") - d("sx") * d("sy") / nd) / (nd - 1.0)
    val varx = (d("sxx") - d("sx") * d("sx") / nd) / (nd - 1.0)
    val vary = (d("syy") - d("sy") * d("sy") / nd) / (nd - 1.0)
    agg.select(col(groupCol), col("n"),
      col("sx"), col("sy"),
      cov.as("covar"),
      sqrt(varx).as("stddev_x"),
      sqrt(vary).as("stddev_y"),
      (cov / (sqrt(varx) * sqrt(vary))).as("corr"))
  }

  /** Append a per-group sample z-score of an integer measure, and an
    * outlier flag at `zThreshold`. The tiny per-group stats table (n, Σx,
    * Σx²) is broadcast back onto the rows — one aggregate plus a
    * broadcast join; the fact side is never shuffled, which is the shape
    * that survives 100 TB (a `Window.partitionBy(group)` would shuffle
    * AND sort every row for three numbers per group).
    */
  def withZScore(df: DataFrame, groupCol: String, xCents: Column,
                 zThreshold: Double, zOut: String = "z",
                 flagOut: String = "is_outlier"): DataFrame = {
    val stats = df.groupBy(groupCol).agg(
      count(lit(1)).as("__n"),
      sum(xCents).as("__sx"),
      sum(xCents * xCents).as("__sxx"))
    val nd = col("__n").cast("double")
    val mean = col("__sx").cast("double") / nd
    val sd = sqrt(
      (col("__sxx").cast("double") -
        col("__sx").cast("double") * col("__sx").cast("double") / nd) /
        (nd - 1.0))
    df.join(broadcast(stats), groupCol)
      .withColumn(zOut, (xCents.cast("double") - mean) / sd)
      .withColumn(flagOut, abs(col(zOut)) > zThreshold)
      .drop("__n", "__sx", "__sxx")
  }
}
