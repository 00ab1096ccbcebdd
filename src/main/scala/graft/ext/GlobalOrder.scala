package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed total-order operators.
  *
  * `Window.orderBy(...)` with no partition key collapses the whole dataset
  * into ONE partition (Spark even warns), so global row numbers / running
  * totals / ntile via WindowExec cannot scale past a single executor's
  * memory. These operators compute the same results with the classic
  * scalable recipe instead: range-repartition on the sort key, sort within
  * partitions, then assign contiguous per-partition ranges from a small
  * per-partition-stats job (p longs to the driver) followed by a
  * per-partition prefix scan. Three distributed passes instead of one
  * single-node pass — at 100 TB that is the difference between a plan that
  * runs and a plan that OOMs the one unlucky executor.
  *
  * The hot path stays on Tungsten InternalRows and is deliberately
  * UNCACHED: the stats job and the prefix-scan job share one sorted RDD
  * lineage, so the range shuffle is written once and each job re-reads
  * the shuffle files, re-paying only the in-partition sort (a few percent
  * of the pass). Persisting the sorted rows — boxed external Rows or even
  * compact UnsafeRow copies — made storage compete with the concurrent
  * sorters' execution memory and failed at 10^8 rows (docs/PLANS.md,
  * lessons 1-2: per-row ratio 1.48 boxed+cached; tasks died with
  * UNABLE_TO_ACQUIRE_MEMORY cached-unsafe; ~1.0 on this uncached path).
  * The appended column is written with a reused JoinedRow +
  * UnsafeProjection — no boxing anywhere.
  *
  * The sort columns MUST form a total order (include a unique tiebreaker):
  * range boundaries are only deterministic when no two rows compare equal.
  */
object GlobalOrder {

  /** Range-sort `df` on `sortCols`, then append `out` = the inclusive
    * prefix fold of `step(row)` under the commutative-associative monoid
    * `(zero, op)` in sort order. Returns the appended DataFrame and the
    * grand fold (free — it falls out of the per-partition stats job).
    * `step`/`op` must be cheap and deterministic. The prefix-scan
    * distribution recipe is monoid-generic: job 1 folds each partition,
    * the driver prefix-folds the p partials into per-partition seeds,
    * job 2 re-scans each partition from its seed.
    */
  private def scanAppendFold(df: DataFrame, sortCols: Seq[Column],
                             out: String, partitions: Int, zero: Long,
                             step: InternalRow => Long,
                             op: (Long, Long) => Long): (DataFrame, Long) = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
    else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = StructType(
      sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    // Both jobs run on the SAME RDD lineage, so the range shuffle is
    // written once and each job re-reads the shuffle files, paying only
    // the reduce-side in-partition sort twice. Deliberately NOT cached:
    // persisting the sorted rows (any storage level) makes storage
    // compete with the 32 concurrent sorters' execution memory — at 10^8
    // rows on an 8 GB heap that contention killed tasks with
    // UNABLE_TO_ACQUIRE_MEMORY, while the double re-sort is a few percent
    // of the pass and needs no storage at all.
    val rdd0 = sorted.queryExecution.toRdd
    // job 1: per-partition folds -> per-partition seed values in range
    // order (p longs to the driver — the only global state)
    val stats = rdd0
      .mapPartitionsWithIndex((i, it) =>
        Iterator((i, it.foldLeft(zero)((acc, r) => op(acc, step(r))))))
      .collect().sortBy(_._1).map(_._2)
    val offsets = stats.scanLeft(zero)(op)
    // job 2: per-partition prefix scan seeded with the offset; the scan
    // value rides in a reused 1-field row joined onto the input row
    val rdd = rdd0.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(schema)
      it.map { row =>
        acc = op(acc, step(row))
        extra.update(0, acc)
        proj(joined(row, extra)): InternalRow
      }
    }
    (GraftShim.internalCreateDataFrame(spark, rdd, schema),
      stats.foldLeft(zero)(op))
  }

  /** [[scanAppendFold]] under the (0, +) monoid: running totals. */
  private def scanAppend(df: DataFrame, sortCols: Seq[Column], out: String,
                         partitions: Int,
                         step: InternalRow => Long): (DataFrame, Long) =
    scanAppendFold(df, sortCols, out, partitions, 0L, step, _ + _)

  /** [[scanAppend]] counting rows: 1-based global row numbers. */
  private def numbered(df: DataFrame, sortCols: Seq[Column], out: String,
                       partitions: Int): (DataFrame, Long) =
    scanAppend(df, sortCols, out, partitions, _ => 1L)

  /** Reject inputs that already carry an output / internal working column
    * name: the append would otherwise produce a duplicate or ambiguous
    * column and fail far from the call site (or, worse, silently resolve
    * to the wrong one in a downstream select). Fail-at-call-site, the
    * [[graft.engine.Skew.saltedJoin]] style.
    */
  private[ext] def requireFresh(df: DataFrame, names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already contains reserved column(s) ${clash.mkString(", ")}" +
        " — rename them (or pass a different `out`) before calling")
  }

  /** Append a 1-based global row number in the total order of `sortCols`.
    * Scales: no single-partition window; ordering work is a range shuffle.
    */
  def withRowNumber(df: DataFrame, sortCols: Seq[Column],
                    out: String = "rn", partitions: Int = 0): DataFrame = {
    requireFresh(df, out)
    numbered(df, sortCols, out, partitions)._1
  }

  /** Append an inclusive running total of the LongType column `valueCol`
    * in the total order of `sortCols` — same semantics as
    * `sum(valueCol).over(Window.orderBy(sortCols))` but scalable (see
    * object doc). This is the primitive behind corpus-order sequence
    * packing ([[Packing.chunkSpans]]), where a 100 TB corpus needs a
    * running token count no single executor could hold.
    *
    * Nulls in `valueCol` count as 0 (SQL SUM ignores them). `sortCols`
    * must form a total order (unique tiebreaker), as with
    * [[withRowNumber]].
    */
  def withRunningTotal(df: DataFrame, sortCols: Seq[Column], valueCol: String,
                       out: String = "running_total",
                       partitions: Int = 0): DataFrame = {
    requireFresh(df, out)
    val vi = df.schema.fieldIndex(valueCol)
    require(df.schema(vi).dataType == LongType,
      s"withRunningTotal needs a LongType value column; " +
        s"$valueCol is ${df.schema(vi).dataType}")
    scanAppend(df, sortCols, out, partitions,
      r => if (r.isNullAt(vi)) 0L else r.getLong(vi))._1
  }

  /** Append an inclusive running MAXIMUM of the LongType column
    * `valueCol` in the total order of `sortCols` — the semantics of
    * `max(valueCol).over(Window.orderBy(sortCols))`, distributed by the
    * same monoid prefix-scan as [[withRunningTotal]] (max is
    * commutative-associative, so the per-partition-fold + driver-seed
    * recipe applies unchanged). The primitive behind dominance /
    * frontier analyses ([[Analytics.skyline2D]]): "best value seen so
    * far in sort order" with no single-partition window.
    *
    * Nulls in `valueCol` are ignored (SQL MAX); rows before the first
    * non-null value carry `Long.MinValue` — filter on it if the leading
    * prefix matters (the appended column is non-nullable by
    * construction).
    */
  def withRunningMax(df: DataFrame, sortCols: Seq[Column], valueCol: String,
                     out: String = "running_max",
                     partitions: Int = 0): DataFrame = {
    requireFresh(df, out)
    val vi = df.schema.fieldIndex(valueCol)
    require(df.schema(vi).dataType == LongType,
      s"withRunningMax needs a LongType value column; " +
        s"$valueCol is ${df.schema(vi).dataType}")
    scanAppendFold(df, sortCols, out, partitions, Long.MinValue,
      r => if (r.isNullAt(vi)) Long.MinValue else r.getLong(vi),
      math.max)._1
  }

  /** Gap sessionization over a total order, hot-key-safe: append a
    * 1-based GLOBAL session id in (key, ts, tieCols) order, incrementing
    * whenever the key changes or the time since the same key's previous
    * event exceeds `gap` (strictly; an event exactly `gap` after the
    * previous one continues the session).
    *
    * The standard formulation — `lag`/`sum` over
    * `Window.partitionBy(key).orderBy(ts)` (q38) — buffers and sorts
    * each key's whole timeline in one task, so a hot key (a bot account
    * with half the event log) becomes the straggler no config can fix.
    * Here the timeline is range-partitioned on (key, ts, tie) instead: a
    * hot key's events stay CONTIGUOUS in range order but spread over
    * many partitions, and the session numbering distributes by the
    * [[withRowNumber]] recipe — per partition, job 1 reports the
    * boundary rows (first/last key and timestamp) plus the count of
    * interior session breaks; the driver resolves each partition-
    * boundary break and prefix-sums break counts into per-partition
    * session-id offsets (2p longs of global state); job 2 re-scans and
    * assigns ids with a reused JoinedRow + UnsafeProjection. Same
    * uncached two-job-one-shuffle discipline as [[withRowNumber]] (see
    * the object doc for why NOT caching the sorted rows is load-bearing).
    *
    * `keyCol`/`tsCol` must be non-null LongType (hash or dictionary-
    * encode other key types; convert timestamps with `unix_micros`);
    * (key, ts, tieCols) must be a total order. Session ids are dense,
    * global, and deterministic: numbering follows the range order, so
    * key k's sessions all precede key k+1's.
    */
  def withSessionId(df: DataFrame, keyCol: String, tsCol: String, gap: Long,
                    tieCols: Seq[Column], out: String = "session_id",
                    partitions: Int = 0): DataFrame = {
    requireFresh(df, out)
    require(gap >= 0, s"gap must be >= 0, got $gap")
    val ki = df.schema.fieldIndex(keyCol)
    val ti = df.schema.fieldIndex(tsCol)
    require(df.schema(ki).dataType == LongType,
      s"withSessionId needs a LongType key column; " +
        s"$keyCol is ${df.schema(ki).dataType}")
    require(df.schema(ti).dataType == LongType,
      s"withSessionId needs a LongType time column; " +
        s"$tsCol is ${df.schema(ti).dataType}")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
    else spark.sessionState.conf.numShufflePartitions
    val sortCols = col(keyCol) +: col(tsCol) +: tieCols
    val sorted = df.repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = StructType(
      sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    val rdd0 = sorted.queryExecution.toRdd
    // job 1: per-partition boundary rows + interior break count. The
    // break status of each partition's FIRST row depends on the previous
    // partition's last row, which only the driver sees — everything else
    // is partition-local.
    val stats = rdd0.mapPartitionsWithIndex { (i, it) =>
      var seen = false
      var fk = 0L; var ft = 0L; var pk = 0L; var pt = 0L; var inner = 0L
      it.foreach { r =>
        val k = r.getLong(ki); val t = r.getLong(ti)
        if (!seen) { fk = k; ft = t; seen = true }
        else if (k != pk || t - pt > gap) inner += 1
        pk = k; pt = t
      }
      Iterator((i, seen, fk, ft, pk, pt, inner))
    }.collect().sortBy(_._1)
    // driver: resolve boundary breaks in range order, prefix-sum break
    // counts into 1-based session-id offsets
    val firstBreak = Array.ofDim[Boolean](stats.length)
    val offsets = Array.ofDim[Long](stats.length)
    var acc = 0L
    var prev: Option[(Long, Long)] = None // last (key, ts) so far
    for (((_, seen, fk, ft, lk, lt, inner), i) <- stats.zipWithIndex) {
      offsets(i) = acc
      if (seen) {
        val fb = prev match {
          case None => true // very first event starts session 1
          case Some((pk2, pt2)) => fk != pk2 || ft - pt2 > gap
        }
        firstBreak(i) = fb
        acc += inner + (if (fb) 1L else 0L)
        prev = Some((lk, lt))
      }
    }
    // job 2: per-partition re-scan assigning ids from the offset
    val rdd = rdd0.mapPartitionsWithIndex { (i, it) =>
      var sid = offsets(i)
      var seen = false
      var pk = 0L; var pt = 0L
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(schema)
      it.map { row =>
        val k = row.getLong(ki); val t = row.getLong(ti)
        val brk =
          if (!seen) firstBreak(i)
          else k != pk || t - pt > gap
        if (brk) sid += 1
        seen = true; pk = k; pt = t
        extra.update(0, sid)
        proj(joined(row, extra)): InternalRow
      }
    }
    GraftShim.internalCreateDataFrame(spark, rdd, schema)
  }

  /** Distributed fill-forward (last observation carried forward): append
    * `out` = the most recent non-null `valueCol` of the SAME key at or
    * before each row in (key, ts, tieCols) order; rows before a key's
    * first observation stay null. Same semantics as
    * `last(value, ignoreNulls).over(Window.partitionBy(key).orderBy(ts))`
    * — and the same hot-key problem: a sensor/user emitting half the
    * rows serializes its whole timeline into one window task. Same cure
    * as [[withSessionId]]: range-partition on (key, ts, tie), resolve
    * partition boundaries with a per-partition stats job (the carry into
    * partition i is the last non-null of i−1's LAST key, which only
    * applies while i still reads that key), then fill in one Tungsten
    * re-scan. `keyCol`/`tsCol` non-null LongType; `valueCol` nullable
    * LongType; (key, ts, tieCols) must be a total order.
    */
  def withFillForward(df: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String, tieCols: Seq[Column],
                      out: String = "filled",
                      partitions: Int = 0): DataFrame = {
    requireFresh(df, out)
    val ki = df.schema.fieldIndex(keyCol)
    val ti = df.schema.fieldIndex(tsCol)
    val vi = df.schema.fieldIndex(valueCol)
    for ((c, i) <- Seq(keyCol -> ki, tsCol -> ti, valueCol -> vi))
      require(df.schema(i).dataType == LongType,
        s"withFillForward needs LongType columns; " +
          s"$c is ${df.schema(i).dataType}")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
    else spark.sessionState.conf.numShufflePartitions
    val sortCols = col(keyCol) +: col(tsCol) +: tieCols
    val sorted = df.repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = StructType(
      sorted.schema.fields :+ StructField(out, LongType, nullable = true))
    val rdd0 = sorted.queryExecution.toRdd
    // job 1: per partition — first key, last key, and the last non-null
    // value observed for the last key WITHIN the partition (if any)
    val stats = rdd0.mapPartitionsWithIndex { (i, it) =>
      var seen = false
      var fk = 0L; var lk = 0L; var lv = 0L; var lvSet = false
      it.foreach { r =>
        val k = r.getLong(ki)
        if (!seen) { fk = k; seen = true }
        else if (k != lk) { lv = 0L; lvSet = false }
        lk = k
        if (!r.isNullAt(vi)) { lv = r.getLong(vi); lvSet = true }
      }
      Iterator((i, seen, fk, lk, lv, lvSet))
    }.collect().sortBy(_._1)
    // driver: thread the carry (key, last non-null) across partitions in
    // range order. A partition whose last key saw no non-null either
    // extends an incoming carry for that same key (single-key partition)
    // or kills it (the key started inside this partition).
    val carryKey = Array.ofDim[Long](stats.length)
    val carryVal = Array.ofDim[Long](stats.length)
    val carrySet = Array.ofDim[Boolean](stats.length)
    var ck = 0L; var cv = 0L; var cs = false
    for (((_, seen, fk, lk, lv, lvSet), i) <- stats.zipWithIndex) {
      carryKey(i) = ck; carryVal(i) = cv; carrySet(i) = cs
      if (seen) {
        if (lvSet) { ck = lk; cv = lv; cs = true }
        else if (!(cs && ck == fk && lk == fk)) cs = false
      }
    }
    // job 2: per-partition fill seeded with the carry
    val rdd = rdd0.mapPartitionsWithIndex { (i, it) =>
      var curKey = carryKey(i)
      var curVal = carryVal(i)
      var curSet = carrySet(i)
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(schema)
      it.map { row =>
        val k = row.getLong(ki)
        if (!curSet || k != curKey) { curKey = k; curSet = false }
        if (!row.isNullAt(vi)) {
          curVal = row.getLong(vi); curSet = true; curKey = k
        }
        if (curSet) extra.update(0, curVal) else extra.setNullAt(0)
        proj(joined(row, extra)): InternalRow
      }
    }
    GraftShim.internalCreateDataFrame(spark, rdd, schema)
  }

  /** Exact GLOBAL median of a LongType column at any scale — the order
    * statistic `percentile(value, 0.5)` computes by buffering all values
    * in one aggregation buffer, done distributed instead: global row
    * numbers over (value, tiebreakers) by the range-shuffle recipe, then
    * the mean of the two middle order statistics (one row for odd n —
    * the mean degenerates to the value itself; integer inputs put the
    * even-n midpoint exactly on the .5 grid, so the double is
    * engine-portable). Returns one row: (n, median).
    *
    * `tieCols` must make (value, tieCols) a total order — the
    * [[withRowNumber]] contract. Cost: the range shuffle plus the
    * p-longs stats job, a filtered scan for 2 rows, and a 2-row
    * aggregate — nothing ever holds more than a partition.
    */
  def medianOfLong(df: DataFrame, valueCol: String,
                   tieCols: Seq[Column]): DataFrame = {
    requireFresh(df, "__graft_rn")
    val vi = df.schema.fieldIndex(valueCol)
    require(df.schema(vi).dataType == LongType,
      s"medianOfLong needs a LongType value column; " +
        s"$valueCol is ${df.schema(vi).dataType}")
    val (rn, n) = numbered(df, col(valueCol) +: tieCols, "__graft_rn", 0)
    require(n > 0, "medianOfLong needs a non-empty input")
    val lo = (n + 1) / 2
    val hi = (n + 2) / 2
    rn.filter(col("__graft_rn") === lo || col("__graft_rn") === hi)
      .agg(count(lit(1)).as("__k"), sum(col(valueCol)).as("__s"))
      .select(lit(n).as("n"),
        (col("__s").cast("double") / col("__k")).as("median"))
  }

  /** Per-key inclusive running total, hot-key-safe: append `out` = the
    * sum of `valueCol` over the SAME key's rows at or before each row in
    * (key, ts, tieCols) order — the
    * `sum(v).over(Window.partitionBy(key).orderBy(ts))` semantics
    * without the hot-key single-task sort. Third member of the
    * boundary-stitch family ([[withSessionId]], [[withFillForward]]):
    * job 1 reports each partition's first/last key and the last key's
    * within-partition value total, the driver threads the carry (a carry
    * extends only while a single-key partition continues its own key),
    * job 2 re-scans and accumulates. Combined with
    * [[graft.ext.AsofJoin.leftAsofBig]] this gives rolling-window
    * aggregates (rolling = T(t) − T(t−W) via an as-of probe) at any key
    * skew. `keyCol`/`tsCol` non-null LongType; `valueCol` LongType,
    * nulls count as 0 (SQL SUM).
    */
  def withRunningTotalPerKey(df: DataFrame, keyCol: String, tsCol: String,
                             valueCol: String, tieCols: Seq[Column],
                             out: String = "running_total",
                             partitions: Int = 0): DataFrame = {
    requireFresh(df, out)
    val ki = df.schema.fieldIndex(keyCol)
    val ti = df.schema.fieldIndex(tsCol)
    val vi = df.schema.fieldIndex(valueCol)
    for ((c, i) <- Seq(keyCol -> ki, tsCol -> ti, valueCol -> vi))
      require(df.schema(i).dataType == LongType,
        s"withRunningTotalPerKey needs LongType columns; " +
          s"$c is ${df.schema(i).dataType}")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
    else spark.sessionState.conf.numShufflePartitions
    val sortCols = col(keyCol) +: col(tsCol) +: tieCols
    val sorted = df.repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = StructType(
      sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    val rdd0 = sorted.queryExecution.toRdd
    // job 1: per partition — first/last key and the value total of the
    // LAST key's rows within this partition
    val stats = rdd0.mapPartitionsWithIndex { (i, it) =>
      var seen = false
      var fk = 0L; var lk = 0L; var tot = 0L
      it.foreach { r =>
        val k = r.getLong(ki)
        if (!seen) { fk = k; seen = true }
        else if (k != lk) tot = 0L
        lk = k
        if (!r.isNullAt(vi)) tot += r.getLong(vi)
      }
      Iterator((i, seen, fk, lk, tot))
    }.collect().sortBy(_._1)
    // driver: thread the carry (key, total-so-far) across partitions
    val carryKey = Array.ofDim[Long](stats.length)
    val carryTot = Array.ofDim[Long](stats.length)
    val carrySet = Array.ofDim[Boolean](stats.length)
    var ck = 0L; var ct = 0L; var cs = false
    for (((_, seen, fk, lk, tot), i) <- stats.zipWithIndex) {
      carryKey(i) = ck; carryTot(i) = ct; carrySet(i) = cs
      if (seen) {
        val carryIn = if (cs && ck == fk) ct else 0L
        if (lk == fk) { ck = lk; ct = carryIn + tot; cs = true }
        else { ck = lk; ct = tot; cs = true }
      }
    }
    // job 2: per-partition accumulation seeded with the carry
    val rdd = rdd0.mapPartitionsWithIndex { (i, it) =>
      var curKey = carryKey(i)
      var acc = if (carrySet(i)) carryTot(i) else 0L
      var curSet = carrySet(i)
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(schema)
      it.map { row =>
        val k = row.getLong(ki)
        if (!curSet || k != curKey) { curKey = k; acc = 0L; curSet = true }
        if (!row.isNullAt(vi)) acc += row.getLong(vi)
        extra.update(0, acc)
        proj(joined(row, extra)): InternalRow
      }
    }
    GraftShim.internalCreateDataFrame(spark, rdd, schema)
  }

  /** Multi-column variant of [[withRunningTotalPerKey]]: append one
    * inclusive per-key running total PER entry of `valueCols` (out
    * column `outs(j)` totals `valueCols(j)`) in a SINGLE range
    * shuffle + sort + two-job stitch. An operator needing several
    * running measures over the same (key, ts, tie) order — e.g. a
    * running value AND a running rank — pays one ordered pass instead
    * of one per measure; the measured difference on the 10⁸-row
    * pareto_hot_group shape is a 1.30 → ~1.0 per-row ratio (each
    * extra stitch re-sorts the whole input). Same contracts as the
    * single-column form: non-null LongType key/ts, LongType values
    * (nulls count 0), (key, ts, tie) a total order.
    */
  def withRunningTotalsPerKey(df: DataFrame, keyCol: String, tsCol: String,
                              valueCols: Seq[String], tieCols: Seq[Column],
                              outs: Seq[String],
                              partitions: Int = 0): DataFrame = {
    require(valueCols.nonEmpty && valueCols.length == outs.length,
      s"valueCols/outs must align, got $valueCols vs $outs")
    requireFresh(df, outs: _*)
    val ki = df.schema.fieldIndex(keyCol)
    val ti = df.schema.fieldIndex(tsCol)
    val vis = valueCols.map(df.schema.fieldIndex).toArray
    for ((c, i) <- (keyCol -> ki) +: (tsCol -> ti) +:
        valueCols.zip(vis.toSeq))
      require(df.schema(i).dataType == LongType,
        s"withRunningTotalsPerKey needs LongType columns; " +
          s"$c is ${df.schema(i).dataType}")
    val m = vis.length
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
    else spark.sessionState.conf.numShufflePartitions
    val sortCols = col(keyCol) +: col(tsCol) +: tieCols
    val sorted = df.repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = StructType(sorted.schema.fields ++
      outs.map(o => StructField(o, LongType, nullable = false)))
    val rdd0 = sorted.queryExecution.toRdd
    // job 1: per partition — first/last key and the LAST key's
    // within-partition totals, one slot per measure
    val stats = rdd0.mapPartitionsWithIndex { (i, it) =>
      var seen = false
      var fk = 0L; var lk = 0L
      val tot = Array.ofDim[Long](m)
      it.foreach { r =>
        val k = r.getLong(ki)
        if (!seen) { fk = k; seen = true }
        else if (k != lk) java.util.Arrays.fill(tot, 0L)
        lk = k
        var j = 0
        while (j < m) {
          if (!r.isNullAt(vis(j))) tot(j) += r.getLong(vis(j))
          j += 1
        }
      }
      Iterator((i, seen, fk, lk, tot))
    }.collect().sortBy(_._1)
    // driver: thread the per-measure carry vector across partitions
    val carryKey = Array.ofDim[Long](stats.length)
    val carryTot = Array.ofDim[Array[Long]](stats.length)
    val carrySet = Array.ofDim[Boolean](stats.length)
    var ck = 0L; var ct = Array.ofDim[Long](m); var cs = false
    for (((_, seen, fk, lk, tot), i) <- stats.zipWithIndex) {
      carryKey(i) = ck; carryTot(i) = ct; carrySet(i) = cs
      if (seen) {
        val carryIn =
          if (cs && ck == fk) ct else Array.ofDim[Long](m)
        ck = lk
        ct = if (lk == fk) Array.tabulate(m)(j => carryIn(j) + tot(j))
        else tot
        cs = true
      }
    }
    // job 2: per-partition accumulation seeded with the carry vector
    val rdd = rdd0.mapPartitionsWithIndex { (i, it) =>
      var curKey = carryKey(i)
      val acc =
        if (carrySet(i)) carryTot(i).clone() else Array.ofDim[Long](m)
      var curSet = carrySet(i)
      val extra = new GenericInternalRow(m)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(schema)
      it.map { row =>
        val k = row.getLong(ki)
        if (!curSet || k != curKey) {
          curKey = k; java.util.Arrays.fill(acc, 0L); curSet = true
        }
        var j = 0
        while (j < m) {
          if (!row.isNullAt(vis(j))) acc(j) += row.getLong(vis(j))
          extra.update(j, acc(j))
          j += 1
        }
        proj(joined(row, extra)): InternalRow
      }
    }
    GraftShim.internalCreateDataFrame(spark, rdd, schema)
  }

  /** Per-key LAG(1), hot-key-safe: append `out` = the IMMEDIATELY
    * previous row's `valueCol` within the same key in (key, ts, tieCols)
    * order, null for each key's first row — the
    * `lag(value, 1).over(Window.partitionBy(key).orderBy(ts))` window-nav
    * semantics without the hot-key single-task sort. Fourth member of
    * the boundary-stitch family ([[withSessionId]], [[withFillForward]],
    * [[withRunningTotalPerKey]]) and the simplest carry of all: job 1
    * reports each partition's final row (key, value, null-ness), the
    * driver threads it forward (a carry survives empty partitions and is
    * consulted only while the next partition continues the same key),
    * job 2 re-scans holding one previous row. Unlike fill-forward the
    * carried value may itself be null — lag of a null is null, not the
    * previous non-null. `keyCol`/`tsCol` non-null LongType; `valueCol`
    * nullable LongType; (key, ts, tieCols) must be a total order.
    */
  def withLagPerKey(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, tieCols: Seq[Column],
                    out: String = "lagged",
                    partitions: Int = 0): DataFrame = {
    requireFresh(df, out)
    val ki = df.schema.fieldIndex(keyCol)
    val ti = df.schema.fieldIndex(tsCol)
    val vi = df.schema.fieldIndex(valueCol)
    for ((c, i) <- Seq(keyCol -> ki, tsCol -> ti, valueCol -> vi))
      require(df.schema(i).dataType == LongType,
        s"withLagPerKey needs LongType columns; " +
          s"$c is ${df.schema(i).dataType}")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
    else spark.sessionState.conf.numShufflePartitions
    val sortCols = col(keyCol) +: col(tsCol) +: tieCols
    val sorted = df.repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = StructType(
      sorted.schema.fields :+ StructField(out, LongType, nullable = true))
    val rdd0 = sorted.queryExecution.toRdd
    // job 1: per partition — the FINAL row's (key, value, value-null)
    val stats = rdd0.mapPartitionsWithIndex { (i, it) =>
      var seen = false
      var lk = 0L; var lv = 0L; var lvNull = true
      it.foreach { r =>
        seen = true
        lk = r.getLong(ki)
        lvNull = r.isNullAt(vi)
        lv = if (lvNull) 0L else r.getLong(vi)
      }
      Iterator((i, seen, lk, lv, lvNull))
    }.collect().sortBy(_._1)
    // driver: the carry into partition i is the final row of the nearest
    // non-empty partition before it
    val carryKey = Array.ofDim[Long](stats.length)
    val carryVal = Array.ofDim[Long](stats.length)
    val carryNull = Array.ofDim[Boolean](stats.length)
    val carrySet = Array.ofDim[Boolean](stats.length)
    var ck = 0L; var cv = 0L; var cn = true; var cs = false
    for (((_, seen, lk, lv, lvNull), i) <- stats.zipWithIndex) {
      carryKey(i) = ck; carryVal(i) = cv; carryNull(i) = cn
      carrySet(i) = cs
      if (seen) { ck = lk; cv = lv; cn = lvNull; cs = true }
    }
    // job 2: per-partition scan holding one previous row
    val rdd = rdd0.mapPartitionsWithIndex { (i, it) =>
      var havePrev = carrySet(i)
      var pk = carryKey(i)
      var pv = carryVal(i)
      var pvNull = carryNull(i)
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(schema)
      it.map { row =>
        val k = row.getLong(ki)
        if (havePrev && pk == k && !pvNull) extra.update(0, pv)
        else extra.setNullAt(0)
        havePrev = true
        pk = k
        pvNull = row.isNullAt(vi)
        pv = if (pvNull) 0L else row.getLong(vi)
        proj(joined(row, extra)): InternalRow
      }
    }
    GraftShim.internalCreateDataFrame(spark, rdd, schema)
  }

  /** Per-key running MAX over a total order, hot-key-safe: append `out` =
    * the maximum of `valueCol` over the same key's rows up to (and, when
    * `inclusive`, including) the current row in (key, ts, tieCols) order —
    * `max(value).over(Window.partitionBy(key).orderBy(ts)
    * [.rowsBetween(unboundedPreceding, -1)])` without the hot-key
    * single-task sort. Fifth member of the boundary-stitch family
    * ([[withSessionId]], [[withFillForward]], [[withRunningTotalPerKey]],
    * [[withLagPerKey]]): job 1 reports each partition's first/last key and
    * the LAST key's within-partition max, the driver threads the carry (a
    * carry extends only while a partition continues its own key), job 2
    * re-scans and folds.
    *
    * The EXCLUSIVE mode (`inclusive = false`) is the interval-merge
    * primitive: a new merged segment starts exactly when a row's start
    * exceeds the max end of every EARLIER interval of its key
    * ([[graft.ext.TimeSeries.intervalCoverage]]). `out` is nullable —
    * null while the (exclusive) prefix holds no non-null value, matching
    * the SQL window frame's empty-frame null. Nulls in `valueCol` are
    * ignored (SQL MAX). `keyCol`/`tsCol` non-null LongType; (key, ts,
    * tieCols) must be a total order.
    */
  def withRunningMaxPerKey(df: DataFrame, keyCol: String, tsCol: String,
                           valueCol: String, tieCols: Seq[Column],
                           out: String = "running_max",
                           inclusive: Boolean = true,
                           partitions: Int = 0): DataFrame = {
    requireFresh(df, out)
    val ki = df.schema.fieldIndex(keyCol)
    val ti = df.schema.fieldIndex(tsCol)
    val vi = df.schema.fieldIndex(valueCol)
    for ((c, i) <- Seq(keyCol -> ki, tsCol -> ti, valueCol -> vi))
      require(df.schema(i).dataType == LongType,
        s"withRunningMaxPerKey needs LongType columns; " +
          s"$c is ${df.schema(i).dataType}")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
    else spark.sessionState.conf.numShufflePartitions
    val sortCols = col(keyCol) +: col(tsCol) +: tieCols
    val sorted = df.repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = StructType(
      sorted.schema.fields :+ StructField(out, LongType, nullable = true))
    val rdd0 = sorted.queryExecution.toRdd
    // job 1: per partition — first/last key and the LAST key's max
    // (has-flag tracks an all-null run; Long has no clean -inf sentinel)
    val stats = rdd0.mapPartitionsWithIndex { (i, it) =>
      var seen = false
      var fk = 0L; var lk = 0L; var mx = 0L; var has = false
      it.foreach { r =>
        val k = r.getLong(ki)
        if (!seen) { fk = k; seen = true }
        else if (k != lk) { mx = 0L; has = false }
        lk = k
        if (!r.isNullAt(vi)) {
          val v = r.getLong(vi)
          mx = if (has) math.max(mx, v) else v
          has = true
        }
      }
      Iterator((i, seen, fk, lk, mx, has))
    }.collect().sortBy(_._1)
    // driver: thread the carry (key, max-so-far, has-value) forward
    val carryKey = Array.ofDim[Long](stats.length)
    val carryMax = Array.ofDim[Long](stats.length)
    val carryHas = Array.ofDim[Boolean](stats.length)
    val carrySet = Array.ofDim[Boolean](stats.length)
    var ck = 0L; var cm = 0L; var ch = false; var cs = false
    for (((_, seen, fk, lk, mx, has), i) <- stats.zipWithIndex) {
      carryKey(i) = ck; carryMax(i) = cm; carryHas(i) = ch; carrySet(i) = cs
      if (seen) {
        val inHas = cs && ck == fk && ch
        if (lk == fk) {
          ck = lk
          cm = if (inHas && has) math.max(cm, mx)
          else if (has) mx else cm
          ch = inHas || has
        } else { ck = lk; cm = mx; ch = has }
        cs = true
      }
    }
    // job 2: per-partition fold seeded with the carry; exclusive mode
    // emits BEFORE folding the current row
    val rdd = rdd0.mapPartitionsWithIndex { (i, it) =>
      var curKey = carryKey(i)
      var curSet = carrySet(i)
      var has = carrySet(i) && carryHas(i)
      var mx = carryMax(i)
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(schema)
      it.map { row =>
        val k = row.getLong(ki)
        if (!curSet || k != curKey) {
          curKey = k; curSet = true; has = false; mx = 0L
        }
        if (!inclusive) {
          if (has) extra.update(0, mx) else extra.setNullAt(0)
        }
        if (!row.isNullAt(vi)) {
          val v = row.getLong(vi)
          mx = if (has) math.max(mx, v) else v
          has = true
        }
        if (inclusive) {
          if (has) extra.update(0, mx) else extra.setNullAt(0)
        }
        proj(joined(row, extra)): InternalRow
      }
    }
    GraftShim.internalCreateDataFrame(spark, rdd, schema)
  }

  /** Per-group percent rank (feature normalization to [0, 1]),
    * hot-group-safe: `out` = (rank − 1)/(n − 1) with rank = the row's
    * 1-based position in (group, value, tieCols) order — the
    * `percent_rank()` shape with ROW_NUMBER tie semantics (ties broken
    * by `tieCols`, so every row gets a distinct rank and the result is
    * deterministic — SQL `percent_rank()`'s shared-rank ties are
    * whatever the engine's RANK says, which is why the oracle mirrors
    * the row-number formulation, not the builtin). Single-row groups
    * normalize to 0. One global [[withRowNumber]] pass + a broadcast of
    * |groups| (lo, n) rows — a group with half the input shuffles by
    * unique rank, never into one task.
    */
  def withGroupPercentRank(df: DataFrame, groupCol: String,
                           valueCol: String, tieCols: Seq[Column],
                           out: String = "pct"): DataFrame = {
    requireFresh(df, out, "__graft_rn", "__graft_lo", "__graft_n")
    val rn = withRowNumber(df,
      col(groupCol) +: col(valueCol) +: tieCols, "__graft_rn")
    val bounds = rn.groupBy(groupCol)
      .agg(min(col("__graft_rn")).as("__graft_lo"),
        count(lit(1)).as("__graft_n"))
    rn.join(broadcast(bounds), Seq(groupCol))
      .withColumn(out, when(col("__graft_n") > 1L,
        (col("__graft_rn") - col("__graft_lo")).cast("double") /
          (col("__graft_n") - 1L).cast("double")).otherwise(0.0))
      .drop("__graft_rn", "__graft_lo", "__graft_n")
  }

  /** Exact PER-GROUP WEIGHTED median, hot-group-safe: the smallest value
    * v in the group with cumulative weight(≤v) ≥ half the group's total
    * weight — the importance-weighted percentile a curation pipeline
    * needs when rows carry sampling/quality weights ("the median token
    * length, weighted by how often we'll actually train on the
    * document"). Rank definition (lower weighted median), not an
    * interpolation, so the result is an actual data value and
    * bit-portable; the half-total comparison is doubled
    * (2·W_i ≥ T) to stay in exact integers.
    *
    * Shape: ONE [[withRunningTotalPerKey]] pass ordered by (key, value,
    * tie) accumulates the weights (boundary-stitch — a hot group never
    * sorts in one task), a combinable per-key total joins back, and the
    * qualifying rows reduce by min(value). `keyCol`/`valueCol`/
    * `weightCol` LongType, weights ≥ 0 with positive group totals;
    * (key, value, tieCols) a total order.
    */
  def groupWeightedMedian(df: DataFrame, keyCol: String, valueCol: String,
                          weightCol: String,
                          tieCols: Seq[Column]): DataFrame = {
    requireFresh(df, "__graft_cw")
    val cum = withRunningTotalPerKey(df, keyCol, valueCol, weightCol,
      tieCols, out = "__graft_cw")
    val totals = cum.groupBy(keyCol)
      .agg(count(lit(1)).as("n"), sum(col(weightCol)).as("w_total"))
    cum.join(totals, Seq(keyCol))
      .filter(col("__graft_cw") * 2L >= col("w_total"))
      .groupBy(keyCol)
      .agg(min(col("n")).as("n"), min(col("w_total")).as("w_total"),
        min(col(valueCol)).as("w_median"))
  }

  /** Exact PER-GROUP median of a LongType column, hot-group-safe.
    *
    * The direct routes both break under skew: `percentile(v, 0.5)` per
    * group buffers a whole group's values in one aggregation buffer, and
    * a rank window (`row_number over partitionBy(grp) orderBy v`) sorts
    * a whole group in one task — a group holding half the input is a
    * single-task straggler either way. Distributed instead via GLOBAL
    * ranks: range-sort on (group, value, tie) and number rows with
    * [[withRowNumber]] (groups are contiguous in the total order, so a
    * group's rows occupy the global rank interval [lo, lo+n)); a
    * combinable aggregate yields each group's `lo` and `n`; the two
    * middle order statistics sit at KNOWN global ranks, so picking them
    * is an equi-join ON THE RANK — unique and uniformly distributed, so
    * the hot group's rows shuffle evenly instead of onto one reducer.
    * The median is the mean of the (one or two) picked values — integer
    * inputs put the even-n midpoint exactly on the .5 grid, so the
    * double is engine-portable ([[medianOfLong]]'s argument, per group).
    *
    * Returns (groupCol, n, median). `(group, value, tieCols)` must be a
    * total order.
    */
  def groupMedianOfLong(df: DataFrame, groupCol: String, valueCol: String,
                        tieCols: Seq[Column]): DataFrame = {
    requireFresh(df, "__rn", "__lo", "n")
    val vi = df.schema.fieldIndex(valueCol)
    require(df.schema(vi).dataType == LongType,
      s"groupMedianOfLong needs a LongType value column; " +
        s"$valueCol is ${df.schema(vi).dataType}")
    val rn = withRowNumber(df,
      col(groupCol) +: col(valueCol) +: tieCols, "__rn")
    val bounds = rn.groupBy(groupCol)
      .agg(min(col("__rn")).as("__lo"), count(lit(1)).as("n"))
    // global ranks of the group's middle order statistics (1 row for odd
    // n — the two middles coincide and distinct() folds them)
    val picks = bounds.select(col(groupCol), col("n"),
      explode(array(expr("__lo + (n - 1) div 2"),
        expr("__lo + n div 2"))).as("__rn"))
      .distinct()
    // pin the pick join: both sides straddle AQE's runtime broadcast
    // threshold at bench scale, so the BHJ build-side choice races run
    // to run — and the losing choice broadcasts the CORPUS-shaped
    // ranked side (observed via q234's recurring fp flip). Shuffle-hash
    // building on the ≤ 2-rows-per-group picks side is the documented
    // shape ("rows shuffle by unique rank"): deterministic, and the
    // build stays narrow at any corpus size (the q118 discipline).
    picks.hint("shuffle_hash")
      .join(rn.select(col("__rn"), col(valueCol)), "__rn")
      .groupBy(groupCol)
      .agg(min(col("n")).as("n"),
        (sum(col(valueCol)).cast("double") / count(lit(1))).as("median"))
  }

  /** Exact PER-GROUP discrete quantile of a LongType column,
    * hot-group-safe — [[groupMedianOfLong]]'s machinery generalized to
    * any percentile (the p95/p99 latency- or length-distribution
    * feature): global ranks over the (group, value, tie) total order, a
    * combinable (lo, n) aggregate per group, then ONE equi-join on the
    * picked global rank `lo + ((n-1)*pPct) div 100` — the 0-based
    * lower-interpolation order statistic, exact in integers, no window,
    * no per-group buffering. A group holding half the input costs the
    * same as any other: its rows shuffle by unique rank, not by group.
    *
    * Returns (groupCol, n, <out> BIGINT — the picked value, making the
    * result bit-portable where an interpolated double would not be).
    */
  def groupQuantileOfLong(df: DataFrame, groupCol: String,
                          valueCol: String, pPct: Int,
                          tieCols: Seq[Column],
                          out: String = "q"): DataFrame = {
    require(pPct >= 0 && pPct <= 100,
      s"pPct must be in [0, 100], got $pPct")
    requireFresh(df, out, "__rn", "__lo", "n")
    val vi = df.schema.fieldIndex(valueCol)
    require(df.schema(vi).dataType == LongType,
      s"groupQuantileOfLong needs a LongType value column; " +
        s"$valueCol is ${df.schema(vi).dataType}")
    val rn = withRowNumber(df,
      col(groupCol) +: col(valueCol) +: tieCols, "__rn")
    val picks = rn.groupBy(groupCol)
      .agg(min(col("__rn")).as("__lo"), count(lit(1)).as("n"))
      .select(col(groupCol), col("n"),
        expr(s"__lo + ((n - 1) * $pPct) div 100").as("__rn"))
    // same build-side pin as groupMedianOfLong (one pick row per group)
    picks.hint("shuffle_hash")
      .join(rn.select(col("__rn"), col(valueCol)), "__rn")
      .select(col(groupCol), col("n"), col(valueCol).as(out))
  }

  /** Exact NTILE(k) over a total order, same semantics as
    * `ntile(k).over(Window.orderBy(sortCols))`: with n rows, the first
    * n % k buckets get one extra row. Distributed (no single-partition
    * window); costs one extra count job over the input.
    */
  def withNtile(df: DataFrame, k: Int, sortCols: Seq[Column],
                out: String = "bucket", partitions: Int = 0): DataFrame = {
    requireFresh(df, out, "__graft_rn")
    require(k > 0, s"ntile bucket count must be positive, got $k")
    val (rn, n) = numbered(df, sortCols, "__graft_rn", partitions)
    val base = n / k
    val rem = n % k
    val cut = rem * (base + 1)
    // `div` = exact integer division on longs (Column./ would go double)
    rn.withColumn(out,
      when(col("__graft_rn") <= cut,
        expr(s"(__graft_rn - 1) div ${base + 1} + 1"))
        .otherwise(expr(
          s"$rem + (__graft_rn - 1 - $cut) div ${math.max(base, 1L)} + 1"))
        .cast("long"))
      .drop("__graft_rn")
  }
}
