package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series resampling over the events stream: densify each key's
  * activity into a contiguous per-period series (gap-fill), the step every
  * downstream rate/trend computation needs before it can assume "one row
  * per key per day".
  *
  * Scale design: the series is generated per key with `sequence()` +
  * `explode()` — a local projection, no shuffle — from each key's
  * [min, max] period span, then left-joined back onto the observed
  * per-period aggregate. Both the aggregate and the join shuffle on the
  * same (key, period) / key columns, so at 100 TB this is two
  * co-partitioned exchanges of COUNTS (one row per key-period), never of
  * raw events. Dense output size is Σ_key(span_days) — callers bound the
  * span (or bucket to coarser periods) when keys live for years.
  *
  * Periods are integer indices (e.g. epoch-days = `ts_us div 86_400_000_000`),
  * not timestamps: integer floor-division is timezone-free and identical
  * on every engine, where date truncation of a timestamp depends on
  * session timezone semantics.
  */
object TimeSeries {

  /** Per-key gap-filled period counts: one row for EVERY period in the
    * key's observed [min, max] span, with `n` = observed row count in that
    * period (0 where the key was silent) and the value sum zero-filled.
    */
  def gapFillDaily(df: DataFrame, keyCol: String, periodIdx: Column,
                   valueCents: Column): DataFrame = {
    val observed = df
      .groupBy(col(keyCol), periodIdx.as("day_idx"))
      .agg(count(lit(1)).as("n"), sum(valueCents).as("value_cents"))
    val spans = observed.groupBy(keyCol)
      .agg(min("day_idx").as("__lo"), max("day_idx").as("__hi"))
    val dense = spans
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"))).as("day_idx"))
    dense.join(observed, Seq(keyCol, "day_idx"), "left")
      .select(col(keyCol), col("day_idx"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("value_cents"), lit(0L)).as("value_cents"))
  }
}
