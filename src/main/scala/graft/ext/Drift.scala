package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two corpus snapshots — the
  * "did this crawl change under us" check a pipeline runs before
  * retraining on a new drop.
  *
  * The report is PER BUCKET, deliberately: the classic scalar drift
  * statistics (PSI, chi-square) sum per-bucket double terms, and a
  * float sum across buckets folds in partition order — nondeterministic
  * under repartitioning and unverifiable against another engine. Each
  * bucket's term here is one fixed composition of IEEE exactly-rounded
  * ops (·, /, −) over exact integer counts, so every row is bit-identical
  * on any layout; the consumer ranks buckets or sums the column knowing
  * the trade.
  *
  * Scale: two partial-aggregated counts (one per snapshot) full-outer
  * joined on the bucket key — shuffle volume is O(distinct buckets) —
  * plus the two 1-row snapshot totals crossJoined (broadcast) back; the
  * raw snapshots are scanned exactly once each (twice total including
  * the totals pass, which Catalyst fuses into the same scan shape).
  */
object Drift {

  /** Per-bucket frequency drift of `bucket` between `cur` and `ref`:
    * counts, frequencies, absolute frequency gap (the L1/2 term), and
    * the chi-square term ((p−q)²/q, null for buckets absent from `ref` —
    * a new-bucket marker the scalar statistic would hide as infinity).
    */
  def frequencyDrift(cur: DataFrame, ref: DataFrame,
                     bucket: Column): DataFrame = {
    def counts(df: DataFrame, n: String): DataFrame =
      df.select(bucket.as("bucket")).groupBy("bucket")
        .agg(count(lit(1)).as(n))
    val j = counts(cur, "n_cur")
      .join(counts(ref, "n_ref"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"))
      .crossJoin(broadcast(cur.agg(count(lit(1)).as("g_cur"))))
      .crossJoin(broadcast(ref.agg(count(lit(1)).as("g_ref"))))
    val p = col("n_cur").cast("double") / col("g_cur")
    val q = col("n_ref").cast("double") / col("g_ref")
    j.select(col("bucket"), col("n_cur"), col("n_ref"),
      p.as("p_cur"), q.as("p_ref"),
      abs(p - q).as("l1_term"),
      when(col("n_ref") > 0, (p - q) * (p - q) / q).as("chi2_term"))
  }
}
