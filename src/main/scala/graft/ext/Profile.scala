package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling: per-column null counts, exact distinct counts, and
  * min/max — the quality report a pipeline runs on every new corpus drop
  * before trusting it.
  *
  * Scale design: ONE aggregation pass computes every column's stats
  * simultaneously (rows=0 output, constant aggregate state), then the
  * single result row is pivoted to the long (one-row-per-column) report
  * shape driver-side — the pivot touches one row, not the data. The
  * multiple `count(distinct …)` aggregates expand the input (Spark's
  * Expand operator: one duplicate of each row per distinct-agg), so the
  * scan cost is columns × rows; at 100 TB swap `countDistinct` for
  * `approx_count_distinct` (HLL — no Expand, one pass, ±2%) via
  * `exact = false`. Min/max are rendered as strings so heterogeneous
  * column types share one report schema.
  */
object Profile {

  /** Profile `cols` of `df`: (col_name, n_rows, n_nulls, n_distinct,
    * min_val, max_val) per column. `exact = false` switches distinct
    * counts to HLL sketches for the single-pass 100 TB shape.
    *
    * Rendering constraint: min/max stringification uses the engine's
    * native double→string rule (Java `Double.toString`), which agrees
    * with DuckDB's `CAST(... AS VARCHAR)` for plain-notation values but
    * diverges in scientific-notation regimes (Spark `1.0E-7` vs DuckDB
    * `1e-07`). The report is for humans, so the native rendering is kept;
    * cross-engine hash comparison of a profile is only defined for
    * columns whose extremes render in plain notation (integers, money,
    * counts — every gated column here). A pipeline needing portable
    * strings for sub-micro/astronomic doubles should pre-scale to
    * integer cents ([[Stats.cents]]) before profiling.
    */
  def profile(df: DataFrame, cols: Seq[String],
              exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // Two aggregates, crossJoined on their single rows, instead of one:
    // string min/max aggregates are sort-based (no mutable fixed-width
    // buffer), and mixing them into the multi-distinct rewrite made the
    // planner SORT the full Expand output (cols+1 copies of every row, 6
    // ordering keys — 6.6s at sf0.1). Separated, the distinct pass stays
    // a HashAggregate over the Expand and the basic pass is a
    // SortAggregate with NO grouping keys — which needs no sort at all.
    val basicAggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        count_if(col(c).isNull).as(s"__nulls_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val ndAggs = cols.map { c =>
      (if (exact) countDistinct(col(c))
       else approx_count_distinct(col(c))).as(s"__nd_$c")
    }
    val one = df.agg(basicAggs.head, basicAggs.tail: _*)
      .crossJoin(df.agg(ndAggs.head, ndAggs.tail: _*))
    // stack(k, name1, vals1..., name2, vals2...) pivots the single result
    // row into one row per column — driver-side cost only.
    val stackArgs = cols.map { c =>
      s"'$c', __rows_$c, __nulls_$c, CAST(__nd_$c AS BIGINT), __min_$c, __max_$c"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_rows, n_nulls, n_distinct, min_val, max_val)")
  }

  /** Join-key skew profile: ONE row summarizing how a prospective
    * join/groupBy key distributes — the audit to run BEFORE committing a
    * 100 TB plan to shuffling on that key, since a hot key is the
    * difference between 1000 even reducers and one straggler ([[
    * graft.engine.Skew]]'s salting exists for exactly what this
    * measures). Output: n_rows, n_keys, max_n (the hottest key's rows),
    * p99_n (the count at ascending rank ⌈0.99·n_keys⌉ — a RANK
    * definition, not an interpolating percentile, so it is
    * engine-exact), mean_n, skew_ratio = max_n/mean_n, and the hottest
    * key rendered as a string (ties → smallest key).
    *
    * Scale shape: per-key counts are one combinable groupBy; max/mean
    * are one reduction over |keys| rows; the p99 pick rides
    * [[GlobalOrder.withRowNumber]] over the counts (range shuffle of
    * |keys| rows, never the data); the three 1-row results cross-join.
    * Nothing collects more than a row.
    */
  /** Exact join-size preflight: predict an equi-join's output
    * cardinality BEFORE running it — one row: matching key count,
    * Σ n_a(k)·n_b(k) (the exact output rows), the largest single key's
    * contribution, and that key (ties → smallest), all from per-key
    * COUNTS (two combinable aggs + one co-keyed join of |keys| rows —
    * the preflight costs a scan of counts, never the join). The
    * "will this join explode" audit that, at 100 TB, decides between
    * running, salting ([[graft.engine.Skew]]), or going back to the
    * author — the output-row budget is adversary-controlled by the
    * hottest key, which is exactly what this reports. Overflow: per-key
    * n_a·n_b and their sum must fit int64 (a predicted output beyond
    * ~9·10¹⁸ rows is its own answer).
    */
  def joinSizeAudit(a: DataFrame, aKey: String, b: DataFrame,
                    bKey: String): DataFrame = {
    val ca = a.groupBy(col(aKey).as("__k")).agg(count(lit(1)).as("__na"))
    val cb = b.groupBy(col(bKey).as("__k")).agg(count(lit(1)).as("__nb"))
    val j = ca.join(cb, Seq("__k"))
      .select(col("__k"), (col("__na") * col("__nb")).as("__prod"))
    val totals = j.agg(count(lit(1)).as("n_matching_keys"),
      sum(col("__prod")).as("est_rows"),
      max(col("__prod")).as("max_key_rows"))
    val hot = j.orderBy(col("__prod").desc, col("__k")).limit(1)
      .select(col("__k").cast("string").as("top_key"))
    totals.crossJoin(broadcast(hot))
  }

  def keySkew(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("__k"))
      .agg(count(lit(1)).as("__n"))
    val totals = counts.agg(
      sum(col("__n")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("__n")).as("max_n"))
    val hot = counts
      .orderBy(col("__n").desc, col("__k"))
      .limit(1)
      .select(col("__k").cast("string").as("top_key"))
    val ranked = GlobalOrder.withRowNumber(counts,
      Seq(col("__n"), col("__k")), out = "__rn")
    // rank ⌈0.99·n_keys⌉ in ascending count order; the totals row is a
    // broadcast-able single row, so the pick is one filtered scan of
    // |keys| rows
    val p99 = ranked.crossJoin(broadcast(totals.select(col("n_keys")
        .as("__nk"))))
      .filter(col("__rn") === ceil(col("__nk") * 0.99).cast("long"))
      .select(col("__n").as("p99_n"))
    totals.crossJoin(broadcast(p99)).crossJoin(broadcast(hot))
      .select(col("n_rows"), col("n_keys"), col("max_n"), col("p99_n"),
        (col("n_rows").cast("double") / col("n_keys").cast("double"))
          .as("mean_n"),
        (col("max_n").cast("double") /
          (col("n_rows").cast("double") / col("n_keys").cast("double")))
          .as("skew_ratio"),
        col("top_key"))
  }
}
