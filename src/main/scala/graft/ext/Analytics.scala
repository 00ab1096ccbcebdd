package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-cutting OLAP analyses built from the scalable primitives:
  * cohort retention, Pareto-frontier (skyline) extraction, and per-key
  * transition counting. Each is a composition of combinable aggregates,
  * co-partitioned joins, and the [[GlobalOrder]] boundary-stitch family —
  * no per-key or global windows anywhere, so every operator keeps its
  * complexity class under key skew and at 100 TB.
  */
object Analytics {

  /** Cohort retention matrix: for activity rows (entity, periodIdx),
    * cohort each entity by its FIRST active period and count distinct
    * entities active at each (cohort, periods-since) offset — the classic
    * "month-0 acquisition, month-k retention" triangle, generalized to
    * any integer period index (epoch-months, epoch-weeks…).
    *
    * Scale design: first-period is a combinable `min` groupBy on the
    * entity key; the activity side is deduplicated to (entity, period)
    * BEFORE the join (so the matrix count is a plain `count(*)`, never a
    * shuffling `count(distinct)`); both the dedup and the cohort lookup
    * shuffle on the SAME entity key, so the join is co-partitioned. The
    * output is at most |periods|² rows — driver-safe at any scale.
    *
    * `periodIdx` must be a non-null integer expression (e.g.
    * `year*12 + month−1`); timezone-free integer indices keep the
    * cohorting identical on every engine.
    */
  def cohortRetention(df: DataFrame, entityCol: String,
                      periodIdx: Column): DataFrame = {
    val act = df.select(col(entityCol).as("__e"),
      periodIdx.cast("long").as("__p")).distinct()
    val cohorts = act.groupBy("__e").agg(min("__p").as("cohort"))
    act.join(cohorts, "__e")
      .groupBy(col("cohort"), (col("__p") - col("cohort")).as("periods_since"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** 2-D skyline (Pareto frontier): the rows not dominated under
    * (minimize `costCol`, maximize `gainCol`) — row b is dominated iff
    * some row a has (cost < b.cost AND gain ≥ b.gain) OR
    * (cost ≤ b.cost AND gain > b.gain). The classic quadratic
    * formulation ("NOT EXISTS dominating row") is a self-join that dies
    * at scale; in 2-D the frontier is exactly the rows whose gain
    * strictly exceeds every strictly-cheaper row's gain AND equals their
    * own cost group's maximum — a prefix-maximum in cost order.
    *
    * Scale design: collapse to one row per distinct cost (combinable
    * `max`), run [[GlobalOrder.withRunningMax]] over cost order (range
    * shuffle, no global window), take the EXCLUSIVE prefix max via
    * [[GlobalOrder.withLagPerKey]] under a constant key (the stitch lag
    * is hot-key-safe, so one global key is fine), and join the per-cost
    * verdict back to the rows — co-partitioned on cost. Every pass moves
    * one row per distinct cost, not per input row.
    *
    * Both columns must be non-null LongType (fixed-point encode doubles
    * with [[Stats.cents]]). Ties: rows equal on BOTH dims are mutually
    * non-dominating and all kept.
    */
  def skyline2D(df: DataFrame, costCol: String, gainCol: String): DataFrame = {
    GlobalOrder.requireFresh(df,
      "__cost", "__gmax", "__gincl", "__gprev", "__one")
    for (c <- Seq(costCol, gainCol))
      require(df.schema(c).dataType ==
        org.apache.spark.sql.types.LongType,
        s"skyline2D needs LongType dims; $c is ${df.schema(c).dataType}")
    val g = df.groupBy(col(costCol).as("__cost"))
      .agg(max(col(gainCol)).as("__gmax"))
    val incl = GlobalOrder.withRunningMax(
      g, Seq(col("__cost")), "__gmax", out = "__gincl")
    val excl = GlobalOrder.withLagPerKey(
      incl.withColumn("__one", lit(0L)), "__one", "__cost", "__gincl",
      Seq.empty, out = "__gprev")
    val verdict = excl
      .filter(col("__gprev").isNull || col("__gmax") > col("__gprev"))
      .select(col("__cost"), col("__gmax"))
    df.join(verdict,
      df(costCol) === verdict("__cost") && df(gainCol) === verdict("__gmax"))
      .drop("__cost", "__gmax")
  }

  /** Per-key first-order transition counts (the Markov chain of an event
    * log): for rows (key, ts, code), count each (previous code → code)
    * pair within the key's timeline, ordered by (ts, tieCols). Each key's
    * first row has no predecessor and contributes nothing.
    *
    * Scale design: the predecessor comes from
    * [[GlobalOrder.withLagPerKey]] — the boundary-stitch per-key LAG, so
    * a hot key (one bot account with half the log) costs a range
    * shuffle, never a single-task window sort — and the count is one
    * map-side-combined groupBy over at most |codes|² groups.
    *
    * `keyCol`/`tsCol`/`codeCol` must be non-null LongType (dictionary-
    * encode string codes first; the alphabet is small by definition for
    * a transition analysis).
    */
  def transitionCounts(df: DataFrame, keyCol: String, tsCol: String,
                       codeCol: String, tieCols: Seq[Column]): DataFrame =
    GlobalOrder.withLagPerKey(df, keyCol, tsCol, codeCol, tieCols,
        out = "__prev")
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_code"), col(codeCol).as("code"))
      .agg(count(lit(1)).as("n"))

  /** Per-group MODE (most frequent value) in two bounded-state passes:
    * a combinable (group, value) count, then the `min(struct)` argmin
    * (the k=1 top-k discipline) selecting (highest count, lowest value)
    * — a TOTAL tiebreak, so the result is deterministic on every engine.
    * No per-group window, no value-list buffering: a group with a
    * billion distinct values costs two hash aggregations, never a sort.
    *
    * Emits the group columns plus `mode` (the winning value), `mode_n`
    * (its count) and `n_rows` (the group's total row count). `valueCol`
    * must be non-null and orderable; the negated-count trick requires
    * the count to fit a signed long (always true — it IS a count).
    */
  def groupMode(df: DataFrame, groupCols: Seq[Column],
                valueCol: Column): DataFrame = {
    GlobalOrder.requireFresh(df, "__v", "__cnt", "__m")
    val counts = df.groupBy((groupCols :+ valueCol.as("__v")): _*)
      .agg(count(lit(1)).as("__cnt"))
    counts.groupBy(groupCols: _*)
      .agg(min(struct((-col("__cnt")).as("nc"), col("__v").as("v")))
          .as("__m"),
        sum("__cnt").as("n_rows"))
      .withColumn("mode", col("__m.v"))
      .withColumn("mode_n", -col("__m.nc"))
      .drop("__m")
  }
}
