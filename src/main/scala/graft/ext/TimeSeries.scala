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

  /** Sweep-line interval concurrency: given intervals [startIdx, endIdx)
    * in integer period units, the maximum number of simultaneously-open
    * intervals per bucket (e.g. per month), plus the earliest period
    * achieving that maximum.
    *
    * The classic formulation — `sum(delta) OVER (ORDER BY t)` — collapses
    * the whole dataset onto one task; this uses [[GlobalOrder]]'s
    * range-shuffle running total instead, so the sweep scales like any
    * other shuffle. Each interval becomes a (+1 at start, −1 at end)
    * event; the total order is (period, delta, tiebreak…) — delta −1
    * sorts before +1, so intervals ENDING at t close before ones opening
    * at t are counted (end-exclusive semantics, and a deterministic order
    * even at heavy tie days). Per-bucket argmax of (concurrency, period)
    * is a combinable `max(struct)` / `min(struct)` aggregate — no window
    * anywhere.
    *
    * `tiebreak` must make the event order total (e.g. the interval's
    * unique key columns); `bucketWidth` groups periods into buckets of
    * `period div bucketWidth` (integer floor division — engine-portable).
    *
    * Semantics note: the per-bucket max is the max over WITHIN-BUCKET
    * event points, evaluated at post-event levels (event-sweep
    * semantics). Concurrency carried INTO a bucket is observed only at
    * that bucket's first event's post-event level — a bucket whose first
    * event is a close (−1) never records the carried-in peak — and
    * buckets spanned by open intervals but containing no events are
    * absent from the output entirely. Callers wanting true
    * interval-max-per-bucket must add a synthetic bucket-boundary probe
    * event per bucket; for the monitoring signal this operator serves,
    * the event-sweep statistic is the standard one.
    */
  def maxConcurrency(df: DataFrame, startIdx: Column, endIdx: Column,
                     bucketWidth: Long,
                     tiebreak: Seq[Column]): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val events = df.select(
      (startIdx.as("t") +: lit(1L).as("delta") +: tiebreak): _*)
      .unionAll(df.select(
        (endIdx.as("t") +: lit(-1L).as("delta") +: tiebreak): _*))
    val swept = GlobalOrder.withRunningTotal(events,
      col("t") +: col("delta") +: tiebreak, "delta", out = "open")
    swept
      .groupBy(expr(s"t div $bucketWidth").as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        max(struct(col("open").as("c"), col("t").as("t")))
          .getField("c").as("max_open"),
        // earliest period achieving the max: min over (-open, t) flips
        // the concurrency ordering while keeping period ascending
        min(struct((-col("open")).as("nc"), col("t").as("t")))
          .getField("t").as("peak_period"))
      .orderBy("bucket")
  }

  /** OHLC-style downsampling: per (group, bucket), the bucket's
    * first/last/max/min value plus the row count — the open/high/low/
    * close financial resample, generalized to any keyed series.
    *
    * Scale design: `open`/`close` are `min_by`/`max_by` argmin/argmax
    * over a FIXED-WIDTH ZERO-PADDED string ordering key — combinable
    * aggregates with O(1) state per group, map-side combined before the
    * one shuffle. The standard formulation (`first_value`/`last_value`
    * over a per-key ordered window) buffers and sorts whole partitions;
    * this one never sorts anything. The ordering key is
    * [[graft.functions.Portable.ordKey]] over (tsUs, unique id) — both
    * engines compare it bytewise, total order, so argmin/argmax are
    * deterministic; `tsUs` and the id must be non-negative (the zero-pad
    * trick breaks on a minus sign) and any non-negative int64 fits the
    * 20-char pad.
    *
    * `value` doubles pass through untouched (open/high/low/close are
    * SELECTIONS, not arithmetic), so results are bit-portable.
    */
  def ohlcResample(df: DataFrame, groupCols: Seq[Column], tsUs: Column,
                   uniqueId: Column, value: Column,
                   bucketWidthUs: Long): DataFrame = {
    require(bucketWidthUs >= 1,
      s"bucketWidthUs must be >= 1, got $bucketWidthUs")
    GlobalOrder.requireFresh(df, "__ohlc_t")
    val ord = graft.functions.Portable.ordKey(tsUs, uniqueId)
    // pure integer bucketing (`div` after subtracting the pmod remainder,
    // the RangeJoin.floorDivSql recipe): a double-precision Divide is
    // exact only below 2^53, a cliff generic reuse of this helper at
    // larger epoch units would silently fall off. `div` needs a named
    // column, so the long timestamp rides in as a temp column the
    // groupBy consumes.
    val withT = df.withColumn("__ohlc_t", tsUs.cast("long"))
    val bucket =
      expr(s"(__ohlc_t - pmod(__ohlc_t, ${bucketWidthUs}L)) div ${bucketWidthUs}L")
    withT.groupBy((groupCols :+ bucket.as("bucket")): _*)
      .agg(
        min_by(value, ord).as("open"),
        max(value).as("high"),
        min(value).as("low"),
        max_by(value, ord).as("close"),
        count(lit(1)).as("n"))
  }

  /** Exact time-weighted average per (key, period) — the semi-additive
    * measure that closing balances approximate: each event's value holds
    * from its timestamp until the key's NEXT event, the step function is
    * clipped to period boundaries, and the average weights value by held
    * duration. Emits (key, period, dur_us, num, twa): `num`/`dur_us` are
    * exact integer sums (value·μs and μs), `twa` their one IEEE
    * quotient — bit-portable.
    *
    * Scale design: the successor timestamp comes from
    * [[GlobalOrder.withLagPerKey]] over the REVERSED (−ts, −id) order —
    * the boundary-stitch lag read backwards is a lead, so a hot key
    * never sorts in one task. Segments explode into the periods they
    * span (bounded by segment length over period width — a local
    * projection), and ONE combinable groupBy does all summing. Each
    * key's final event holds no segment (no successor) and contributes
    * nothing; zero-length segments (equal-timestamp ties) are dropped.
    *
    * `keyCol`/`tsUsCol`/`idCol` non-null LongType, timestamps
    * non-negative, `valueCol` an integer (cents-grid) LongType measure.
    * Overflow budget: |value| · periodUs · (segments per key-period)
    * must fit int64 — at cents ≤ 10⁶ and day periods that is ~10⁵
    * segments per key-day, far past any real event stream.
    */
  def timeWeightedPerPeriod(df: DataFrame, keyCol: String, tsUsCol: String,
                            idCol: String, valueCol: String,
                            periodUs: Long): DataFrame = {
    require(periodUs >= 1, s"periodUs must be >= 1, got $periodUs")
    GlobalOrder.requireFresh(df, "__negts", "__next_ts", "__p")
    val withNeg = df.withColumn("__negts", -col(tsUsCol))
    val nxt = GlobalOrder.withLagPerKey(withNeg, keyCol, "__negts",
        tsUsCol, Seq(-col(idCol)), out = "__next_ts")
      .drop("__negts")
    val seg = nxt.filter(col("__next_ts").isNotNull &&
      col("__next_ts") > col(tsUsCol))
    val spans = seg.withColumn("__p", explode(sequence(
      expr(s"$tsUsCol div $periodUs"),
      expr(s"(__next_ts - 1) div $periodUs"))))
    val overlap = least(col("__next_ts"), (col("__p") + 1) * periodUs) -
      greatest(col(tsUsCol), col("__p") * periodUs)
    spans
      .groupBy(col(keyCol), col("__p").as("period"))
      .agg(sum(overlap).as("dur_us"),
        sum(col(valueCol) * overlap).as("num"))
      .withColumn("twa", col("num").cast("double") / col("dur_us"))
  }

  /** Per-key interval-union length ("total covered time"): merge each
    * key's half-open [start, end) intervals and return (key, covered,
    * n_segments) — covered = Σ merged-segment lengths, n_segments = the
    * count of maximal merged runs. The utilization/coverage primitive
    * behind "how long was this user/host/device actually active",
    * robust to arbitrarily overlapping and nested intervals where
    * naive `sum(end - start)` double-counts every overlap.
    *
    * The classic sweep needs, per key in start order, the max end over
    * all EARLIER intervals — a new merged segment starts exactly when
    * `start > that prefix max` (an interval touching the previous end,
    * `start == max`, merges: half-open continuity). Both ordered passes
    * ride the boundary-stitch family, so a hot key (one device with
    * half the intervals) spreads over many partitions instead of
    * sorting in one task:
    *   1. [[GlobalOrder.withRunningMaxPerKey]] (EXCLUSIVE) marks
    *      segment-opening rows;
    *   2. [[GlobalOrder.withRunningTotalPerKey]] prefix-sums the marks
    *      into per-key dense segment ids;
    *   3. one combinable groupBy((key, segment)) takes min(start)/
    *      max(end) — a merged run's union is the single interval
    *      [min start, max end], by induction on the merge condition —
    *      and a second groupBy(key) sums the exact integer lengths.
    *
    * All arithmetic is integer; `keyCol`/`startCol`/`endCol` LongType,
    * (key, start, end) must be a total order (dedup identical triples
    * first), every end >= its start.
    */
  def intervalCoverage(df: DataFrame, keyCol: String, startCol: String,
                       endCol: String): DataFrame = {
    GlobalOrder.requireFresh(df, "__graft_pmax", "__graft_new", "__graft_gid")
    val m = GlobalOrder.withRunningMaxPerKey(df, keyCol, startCol, endCol,
      Seq(col(endCol)), out = "__graft_pmax", inclusive = false)
    val flagged = m.withColumn("__graft_new",
      when(col("__graft_pmax").isNull ||
        col(startCol) > col("__graft_pmax"), 1L).otherwise(0L))
    val gid = GlobalOrder.withRunningTotalPerKey(flagged, keyCol, startCol,
      "__graft_new", Seq(col(endCol)), out = "__graft_gid")
    gid.groupBy(col(keyCol), col("__graft_gid"))
      .agg(min(col(startCol)).as("__graft_s"),
        max(col(endCol)).as("__graft_e"))
      .groupBy(col(keyCol))
      .agg(sum(col("__graft_e") - col("__graft_s")).as("covered"),
        count(lit(1)).as("n_segments"))
  }

  /** Per-key longest run of CONSECUTIVE integer indices — the
    * gaps-and-islands summary ("longest daily-activity streak") behind
    * retention/habit scoring: from the key's distinct index set, the
    * maximal runs where each index is exactly prev+1. Returns one row
    * per key: `n_idx` (distinct indices), `n_runs` (maximal runs),
    * `longest` (longest run length), `longest_start` (that run's first
    * index; ties → the earliest run).
    *
    * Shape: distinct (one combinable groupBy), then two
    * boundary-stitch passes over the compacted per-key index rows —
    * [[GlobalOrder.withLagPerKey]] marks run breaks (first row or
    * gap > 1), [[GlobalOrder.withRunningTotalPerKey]] turns break
    * flags into run ids — then two combinable groupBys (per run, per
    * key). A key active every day for a decade is ~3 650 rows after
    * compaction; no per-key single-task sort anywhere. The
    * longest-run argmax is a min-of-struct((−len, start)) — combinable
    * and deterministic under ties. `keyCol`/`idxCol` non-null
    * LongType.
    */
  def longestRun(df: DataFrame, keyCol: String, idxCol: String,
                 partitions: Int = 0): DataFrame = {
    GlobalOrder.requireFresh(df, "__graft_prev", "__graft_brk",
      "__graft_run")
    val d = df.select(col(keyCol), col(idxCol)).distinct()
    val lag = GlobalOrder.withLagPerKey(d, keyCol, idxCol, idxCol,
      Seq.empty, out = "__graft_prev", partitions = partitions)
    val flagged = lag.withColumn("__graft_brk",
      when(col("__graft_prev").isNull ||
        col(idxCol) - col("__graft_prev") > 1L, 1L).otherwise(0L))
    val runs = GlobalOrder.withRunningTotalPerKey(flagged, keyCol, idxCol,
        "__graft_brk", Seq.empty, out = "__graft_run",
        partitions = partitions)
      .groupBy(col(keyCol), col("__graft_run"))
      .agg(count(lit(1)).as("__graft_len"), min(col(idxCol)).as("__graft_s"))
    runs.groupBy(col(keyCol))
      .agg(sum(col("__graft_len")).as("n_idx"),
        max(col("__graft_run")).as("n_runs"),
        max(col("__graft_len")).as("longest"),
        min(struct((-col("__graft_len")).as("nl"),
          col("__graft_s").as("s"))).as("__graft_best"))
      .select(col(keyCol), col("n_idx"), col("n_runs"), col("longest"),
        col("__graft_best").getField("s").as("longest_start"))
  }

  /** Per-key seasonal-naive forecast backtest: score the zero-parameter
    * forecast ŷ(p) = y(p − period) against the actuals — the floor any
    * real forecasting model must beat, and the first drift alarm when a
    * series stops being seasonal (its own MAE jumps). Input is the
    * PER-PERIOD aggregate (one row per (key, period), integer value —
    * run the combinable daily rollup first); only periods where both
    * the actual and its period-back ancestor exist are scored.
    *
    * Returns (key, n scored periods, sum_abs_err, mae, bias): the error
    * sums are exact int64 in the caller's integer units under any
    * partitioning; mae = Σ|e|/n and bias = Σe/n are each ONE IEEE
    * division. Shape: one self-equi-join on (key, period + period-shift)
    * — co-partitioned on the same key columns as the rollup that built
    * the input, so at 100 TB the join moves one row per key-period,
    * never raw events — then one combinable three-sum fold.
    */
  def seasonalNaiveBacktest(df: DataFrame, keyCol: String, idxCol: String,
                            valueCol: String, period: Long): DataFrame = {
    require(period > 0L, s"period must be positive, got $period")
    GlobalOrder.requireFresh(df, "__graft_f", "__graft_e", "n",
      "sum_abs_err", "mae", "bias")
    val forecast = df.select(col(keyCol),
      (col(idxCol) + period).as(idxCol), col(valueCol).as("__graft_f"))
    df.join(forecast, Seq(keyCol, idxCol))
      .withColumn("__graft_e", col(valueCol) - col("__graft_f"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(abs(col("__graft_e"))).as("sum_abs_err"),
        sum(col("__graft_e")).as("__graft_se"))
      .select(col(keyCol), col("n"), col("sum_abs_err"),
        (col("sum_abs_err").cast("double") / col("n").cast("double"))
          .as("mae"),
        (col("__graft_se").cast("double") / col("n").cast("double"))
          .as("bias"))
  }

  /** Conformal interval backtest for a lag-`lag` seasonal-naive
    * forecaster: per key, the absolute residual |y(t) − y(t − lag)| is
    * collected on a CALIBRATION index window, its exact discrete
    * `pPct` quantile becomes the interval half-width q̂ (split-conformal
    * — distribution-free coverage ≥ pPct up to discreteness), and the
    * TEST window reports how often the interval actually covered. The
    * ML-ops gate behind "can we trust this forecast band" — with every
    * quantity an exact integer (cents residuals, rank-picked quantile
    * via [[GlobalOrder.groupQuantileOfLong]]'s boundary-stitch — no
    * per-key window) and coverage one final IEEE division.
    *
    * `series` must expose (keyCol, idxCol LongType, yCol LongType)
    * with one row per (key, idx). Returns per key:
    * (key, n_cal, q_hat, n_test, n_covered, coverage).
    */
  def conformalBacktest(series: DataFrame, keyCol: String, idxCol: String,
                        yCol: String, lag: Int,
                        calLo: Long, calHi: Long,
                        testLo: Long, testHi: Long,
                        pPct: Int): DataFrame = {
    require(lag >= 1, s"lag must be >= 1, got $lag")
    require(calHi < testLo,
      s"calibration window [$calLo,$calHi] must precede test " +
        s"[$testLo,$testHi] — leakage otherwise")
    val base = series.select(col(keyCol), col(idxCol).cast("long").as("__i"),
      col(yCol).cast("long").as("__y"))
    val resid = base.as("a")
      .join(base.as("b"),
        col(s"a.$keyCol") === col(s"b.$keyCol") &&
          col("b.__i") === col("a.__i") - lag)
      .select(col(s"a.$keyCol").as(keyCol), col("a.__i").as("__i"),
        abs(col("a.__y") - col("b.__y")).as("__r"))
    val cal = resid.filter(col("__i") >= calLo && col("__i") <= calHi)
    val qhat = GlobalOrder.groupQuantileOfLong(cal, keyCol, "__r", pPct,
        tieCols = Seq(col("__i")), out = "q_hat")
      .select(col(keyCol), col("n").as("n_cal"), col("q_hat"))
    // key-keyed equi-join (NOT broadcast: one q̂ row per key — key
    // cardinality is unbounded in general; AQE picks the strategy)
    resid.filter(col("__i") >= testLo && col("__i") <= testHi)
      .join(qhat, Seq(keyCol))
      .groupBy(keyCol)
      .agg(first(col("n_cal")).as("n_cal"), first(col("q_hat")).as("q_hat"),
        count(lit(1)).as("n_test"),
        count_if(col("__r") <= col("q_hat")).as("n_covered"))
      .select(col(keyCol), col("n_cal"), col("q_hat"), col("n_test"),
        col("n_covered"),
        (col("n_covered").cast("double") / col("n_test").cast("double"))
          .as("coverage"))
  }

  /** Interrupted-time-series effect read (the pre/post causal
    * template): fit the pre-window linear trend per key in closed form
    * (exact integer normal-equation sums — [[graft.ext.Stats.groupLinFit]]'s
    * moment discipline), extrapolate it over the post window, and
    * report the TOTAL divergence Σ(actual − predicted). The total is
    * computed as `Σy − (n_post·a + b·Σx)` — one combinable aggregate
    * per window, never an ordered float running sum — so the effect is
    * bit-portable. The "did the launch change the level" read that a
    * bare pre/post mean diff gets wrong whenever the series already
    * trends.
    *
    * `series` must expose (keyCol, idxCol LongType, yCol LongType),
    * one row per (key, idx); index arithmetic is relative to `preLo`
    * to keep x² sums small. Keys with a degenerate pre fit (n < 2 or
    * zero x-variance) emit null slope/effect. Returns
    * (key, n_pre, slope, intercept, n_post, actual_total, pred_total,
    * effect_total).
    */
  def interruptedTrend(series: DataFrame, keyCol: String, idxCol: String,
                       yCol: String, preLo: Long, preHi: Long,
                       postLo: Long, postHi: Long): DataFrame = {
    require(preHi < postLo,
      s"pre window [$preLo,$preHi] must precede post [$postLo,$postHi]")
    val base = series.select(col(keyCol),
      (col(idxCol).cast("long") - preLo).as("__x"),
      col(yCol).cast("long").as("__y"))
    val pre = base.filter(col("__x") >= 0 && col("__x") <= preHi - preLo)
      .groupBy(keyCol).agg(count(lit(1)).as("n_pre"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__x") * col("__y")).as("__sxy"))
    val post = base.filter(col("__x") >= postLo - preLo &&
        col("__x") <= postHi - preLo)
      .groupBy(keyCol).agg(count(lit(1)).as("n_post"),
        sum(col("__x")).as("__px"), sum(col("__y")).as("actual_total"))
    def d(c: String) = col(c).cast("double")
    val nd = d("n_pre")
    val denom = nd * d("__sxx") - d("__sx") * d("__sx")
    val ok = col("n_pre") >= 2 && denom =!= 0.0
    val b = (nd * d("__sxy") - d("__sx") * d("__sy")) / denom
    val a = (d("__sy") - b * d("__sx")) / nd
    val predTotal = d("n_post") * a + b * d("__px")
    pre.join(post, Seq(keyCol))
      .select(col(keyCol), col("n_pre"),
        when(ok, b).as("slope"), when(ok, a).as("intercept"),
        col("n_post"), col("actual_total"),
        when(ok, predTotal).as("pred_total"),
        when(ok, d("actual_total") - predTotal).as("effect_total"))
  }
}
