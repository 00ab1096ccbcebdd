package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single right row with the greatest
  * `rightTime <= leftTime` within the same key — the operator behind
  * point-in-time feature lookups and trade/quote alignment.
  *
  * Spark has no native ASOF JOIN (DuckDB does; the reference engine has no
  * joins at all — SURVEY.md §2.4). A naive range join
  * (`l.key = r.key && r.ts <= l.ts` + max-per-left) explodes to the full
  * per-key cross product before pruning. This implementation is the
  * union-interleave technique instead: tag both sides, union them, and run
  * ONE window pass per key ordered by (time, side) where the right side
  * sorts first on ties (inclusive `<=` semantics) — `last_value(..,
  * ignoreNulls)` of the right payload at each left row is exactly the
  * as-of match.
  *
  * Scale: one shuffle of |L| + |R| rows on the key, no intermediate blowup,
  * window state is O(1) per row (running last value). Skewed keys AQE-split
  * like any other shuffle.
  *
  * The right side must be unique per (key, time) — ties inside the right
  * table have no deterministic "latest" row (DuckDB's ASOF has the same
  * caveat); pre-aggregate duplicates away before calling.
  */
object AsofJoin {

  /** Left as-of join. Returns all left columns plus, for each
    * `rightValue` column, the value from the matching right row (null when
    * no right row is at-or-before the left row's time).
    *
    * @param left       probe side
    * @param right      reference side (unique per (key, time))
    * @param key        equi-key column name present on both sides
    * @param leftTime   event-time column name on `left`
    * @param rightTime  event-time column name on `right`
    * @param rightValues right payload columns to carry (renamed as-is)
    */
  def leftAsof(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightValues: Seq[String]): DataFrame = {
    // left payload = left columns minus the key/time already lifted out
    val lp = left.columns.filterNot(c => c == key || c == leftTime).toSeq
    // one unified schema: key, ts, side tag, left payload, right payload
    val l = left.select(
      col(key).as("__k") +: col(leftTime).as("__t") +: lit(1).as("__side") +:
        (lp.map(col) ++
          rightValues.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
    val r = right.select(
      col(key).as("__k") +: col(rightTime).as("__t") +: lit(0).as("__side") +:
        (lp.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          rightValues.map(col)): _*)
    // right (side 0) sorts before left (side 1) at equal time => inclusive
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r).select(
      (Seq(col("__k"), col("__t"), col("__side")) ++ lp.map(col) ++
        rightValues.map(c =>
          last(when(col("__side") === 0, col(c)), ignoreNulls = true)
            .over(w).as(c))): _*)
    matched.filter(col("__side") === 1)
      .select(col("__k").as(key) +: col("__t").as(leftTime) +:
        (lp.map(col) ++ rightValues.map(col)): _*)
  }
}
