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
}
