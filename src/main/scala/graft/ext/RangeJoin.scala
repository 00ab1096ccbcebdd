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

  /** Match every point to every interval containing it — `[start, end)`
    * semantics over long microsecond columns. Intervals with
    * `end <= start` are dropped (empty by definition; also keeps the
    * descending-`sequence` footgun out: Spark generates a DESCENDING range
    * when the upper bin sorts below the lower one).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointUs: String, startUs: String, endUs: String,
                      binUs: Long): DataFrame = {
    require(binUs > 0, s"bin width must be positive, got $binUs")
    val p = points.withColumn("__bin", expr(s"$pointUs div $binUs"))
    val i = intervals
      .filter(col(endUs) > col(startUs))
      .withColumn("__bin", explode(sequence(
        expr(s"$startUs div $binUs"), expr(s"($endUs - 1) div $binUs"))))
    p.join(i, Seq("__bin")).drop("__bin")
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
    * across the two sides; empty intervals (`e <= s`) are dropped.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      ls: String, le: String, rs: String, re: String,
                      binUs: Long): DataFrame = {
    require(binUs > 0, s"bin width must be positive, got $binUs")
    val l = left.filter(col(le) > col(ls))
      .withColumn("__bin", explode(sequence(
        expr(s"$ls div $binUs"), expr(s"($le - 1) div $binUs"))))
    val r = right.filter(col(re) > col(rs))
      .withColumn("__bin", explode(sequence(
        expr(s"$rs div $binUs"), expr(s"($re - 1) div $binUs"))))
    l.join(r, Seq("__bin"))
      .filter(col(ls) < col(re) && col(rs) < col(le))
      .filter(col("__bin") === expr(s"greatest($ls, $rs) div $binUs"))
      .drop("__bin")
  }
}
