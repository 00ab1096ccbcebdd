package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join via time binning.
  *
  * Spark plans a bare `p.ts >= i.start && p.ts < i.end` join as a
  * broadcast-nested-loop — O(|P|·|I|) comparisons, unusable when neither
  * side broadcasts. Binning converts it to an equi-join: every interval
  * explodes to the fixed-width bins it overlaps, every point maps to its
  * one bin, the join key is the bin id, and the exact predicate re-filters
  * the per-bin candidates. Work becomes O(|P| + |I|·len/bin + candidates),
  * shuffled by bin — the standard trick Spark itself lacks but dedicated
  * engines ship as a native operator.
  *
  * Pick `binUs` near the typical interval length: too small inflates the
  * interval explode factor (len/bin copies per interval), too large
  * inflates per-bin candidate pairs. Both sides' column names must be
  * disjoint (the join keeps all of them).
  */
object RangeJoin {

  /** Exact FLOOR division on longs, in pure integer arithmetic. Spark's
    * `div` truncates toward zero, which with negative coordinates makes
    * "bin 0" span 2·binUs−1 values — results stay correct (bin ids are
    * still monotonic and consistent between sides), but the per-bin
    * candidate density the docs tell callers to tune `binUs` against
    * silently doubles around the origin. `pmod(x, b)` is always in
    * [0, b), so x − pmod(x, b) is the greatest multiple of b at or below
    * x; the `div` then divides exactly. Uniform bin width at any sign,
    * no double-precision detour.
    */
  private def floorDivSql(x: String, b: Long): String =
    s"(($x - pmod($x, ${b}L)) div ${b}L)"

  /** Match every point to every interval containing it — `[start, end)`
    * semantics over long microsecond columns; coordinates may be
    * negative (floor-division binning keeps every bin the same width).
    * Intervals with `end <= start` are dropped (empty by definition;
    * also keeps the descending-`sequence` footgun out: Spark generates a
    * DESCENDING range when the upper bin sorts below the lower one).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointUs: String, startUs: String, endUs: String,
                      binUs: Long): DataFrame = {
    require(binUs > 0, s"bin width must be positive, got $binUs")
    val p = points.withColumn("__bin", expr(floorDivSql(pointUs, binUs)))
    val i = intervals
      .filter(col(endUs) > col(startUs))
      .withColumn("__bin", explode(sequence(
        expr(floorDivSql(startUs, binUs)),
        expr(floorDivSql(s"($endUs - 1)", binUs)))))
    p.join(i, Seq("__bin")).drop("__bin")
      .filter(col(pointUs) >= col(startUs) && col(pointUs) < col(endUs))
  }

  /** [[pointInInterval]] with an additional equi-key: candidates must
    * share (key, bin), so intervals of different entities never meet —
    * the per-entity lookback/validity join (attribution windows, session
    * containment). Same `[start, end)` semantics, same
    * drop-empty-intervals rule; the two key columns may be named
    * differently per side (they are equated, and the right key is
    * dropped from the output). All other column names must be disjoint
    * across the two sides.
    *
    * Scale: the bin key subdivides each entity's timeline, so a hot
    * entity's candidates spread across its bins instead of one task;
    * keep `binUs` near the typical interval length (crowded bins =
    * candidates that fail the exact predicate).
    */
  def pointInIntervalKeyed(points: DataFrame, intervals: DataFrame,
                           pointKey: String, intervalKey: String,
                           pointUs: String, startUs: String, endUs: String,
                           binUs: Long): DataFrame = {
    require(binUs > 0, s"bin width must be positive, got $binUs")
    val p = points.withColumn("__bin", expr(floorDivSql(pointUs, binUs)))
      .withColumn("__k", col(pointKey))
    val i = intervals
      .filter(col(endUs) > col(startUs))
      .withColumn("__bin", explode(sequence(
        expr(floorDivSql(startUs, binUs)),
        expr(floorDivSql(s"($endUs - 1)", binUs)))))
      .withColumn("__k", col(intervalKey))
      .drop(intervalKey)
    p.join(i, Seq("__k", "__bin")).drop("__bin", "__k")
      .filter(col(pointUs) >= col(startUs) && col(pointUs) < col(endUs))
  }

  /** Interval × interval overlap join — every (left, right) pair whose
    * `[ls, le) × [rs, re)` intervals intersect, by the same binning
    * trick: both sides explode to the bins they span, candidates meet on
    * the bin key, and the exact predicate (`ls < re AND rs < le`)
    * re-filters. A pair overlapping across several shared bins would
    * match in each of them, so each surviving pair is attributed to
    * exactly ONE bin — the bin containing the overlap's start
    * (`greatest(ls, rs)`), which both sides span by construction — and
    * every other bin's copy is dropped. No distinct, no window: the
    * dedup is a per-row predicate.
    *
    * Scale: work is O(Σ len/bin) explode rows + per-bin candidate
    * products. Degenerate long intervals (a right row spanning the whole
    * domain) cost their bin span LINEARLY and pair with everything they
    * genuinely overlap — that blowup is the OUTPUT, not an artifact.
    * The artifact risk is crowded bins (candidates that fail the
    * predicate); keep `binUs` near the typical interval length so per-bin
    * membership tracks overlap density. Column names must be disjoint
    * across the two sides; empty intervals (`e <= s`) are dropped;
    * coordinates may be negative (floor-division binning).
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      ls: String, le: String, rs: String, re: String,
                      binUs: Long): DataFrame = {
    require(binUs > 0, s"bin width must be positive, got $binUs")
    val l = left.filter(col(le) > col(ls))
      .withColumn("__bin", explode(sequence(
        expr(floorDivSql(ls, binUs)), expr(floorDivSql(s"($le - 1)", binUs)))))
    val r = right.filter(col(re) > col(rs))
      .withColumn("__bin", explode(sequence(
        expr(floorDivSql(rs, binUs)), expr(floorDivSql(s"($re - 1)", binUs)))))
    l.join(r, Seq("__bin"))
      .filter(col(ls) < col(re) && col(rs) < col(le))
      .filter(col("__bin") === expr(floorDivSql(s"greatest($ls, $rs)", binUs)))
      .drop("__bin")
  }
}
