package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable.hash60

/** Deterministic sampling and splitting for training-data pipelines.
  *
  * Everything here derives from the content key's md5 hash, never from
  * `rand()`: assignments are reproducible across runs, partitionings,
  * engines (the DuckDB oracle verifies them), and — critically — across
  * RE-RUNS OVER GROWING DATA: a document keeps its train/val/test
  * assignment when the corpus is re-snapshotted, which random splits
  * cannot guarantee without persisting state.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the key column's content. */
  def hashBucket(key: Column, buckets: Int = 10000): Column =
    pmod(hash60(key.cast("string")), lit(buckets))

  /** Named splits by cumulative fraction over the hash space, e.g.
    * Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1). Fractions are exact
    * over the bucket space (80/10/10 => buckets [0,8000), [8000,9000),
    * [9000,10000)); actual row proportions converge by key-hash
    * uniformity.
    */
  def splitAssign(key: Column, splits: Seq[(String, Double)],
                  buckets: Int = 10000): Column = {
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val b = hashBucket(key, buckets)
    val cuts = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    splits.zip(cuts).init.foldRight(lit(splits.last._1): Column) {
      case (((name, _), cut), acc) =>
        when(b < math.round(cut * buckets), name).otherwise(acc)
    }
  }

  /** Deterministic fractional sample: keep rows whose key hashes below the
    * fraction cut. Same key => same decision, forever.
    */
  def sampleByHash(df: DataFrame, key: Column, fraction: Double,
                   buckets: Int = 10000): DataFrame =
    df.filter(hashBucket(key, buckets) < math.round(fraction * buckets))

  /** Stratified sampling: a different keep-fraction per stratum value
    * (class rebalancing — downsample the majority class, keep the rare
    * one whole). Same content-hash determinism as [[sampleByHash]]: no
    * rand(), assignments survive re-runs over grown data. Strata not in
    * `fractions` keep `default`.
    */
  def stratifiedSample(df: DataFrame, strata: Column, key: Column,
                       fractions: Map[String, Double],
                       default: Double = 0.0,
                       buckets: Int = 10000): DataFrame = {
    val cut = fractions.foldLeft(
      lit(math.round(default * buckets)): Column) {
      case (acc, (s, f)) =>
        when(strata === s, lit(math.round(f * buckets))).otherwise(acc)
    }
    df.filter(hashBucket(key, buckets) < cut)
  }

  /** Per-row weighted sampling: keep each row with probability `weight`
    * (a column in [0,1] — e.g. a quality score), decided by the key's
    * content hash. The decision is deterministic per key, so re-runs over
    * grown data keep prior selections, and the DuckDB oracle reproduces
    * it exactly. `floor` (not cast) maps the weight to the bucket space:
    * double->int casts round half-up in some engines and truncate in
    * others, which would flip rows at the boundary.
    */
  def sampleByWeight(df: DataFrame, key: Column, weight: Column,
                     buckets: Int = 1000000): DataFrame =
    df.filter(hashBucket(key, buckets) < floor(weight * buckets))

  /** Class-balanced cap: keep at most `n` rows per group, chosen by a
    * deterministic order (window row_number — one shuffle on the group
    * key). `orderCol` ties are broken by a hash of the whole row, so the
    * kept set is stable across runs/partitionings even for non-unique
    * order columns (row_number alone would tie-break by arrival order).
    *
    * SKEW CAVEAT: a window sort cannot be split — a group holding half
    * the input sorts in one task (AQE skew handling applies to joins,
    * not window partitions). Curation groups (source, lang) are
    * few-and-large but BOUNDED in count, not in size: when the hot-group
    * risk is real and group/order columns are LongType, use
    * [[capPerGroupBig]] (the boundary-stitch rank, no window at all);
    * for numeric order columns
    * [[graft.functions.TopKFunctions.topkPerGroup]] (bounded O(k)
    * per-partition state, `topk_hot_group` shape 0.16) plus a
    * join-back also applies — the trade is its (key, id) row identity
    * vs this operator's arbitrary-row exactness under hash-tie
    * collisions.
    */
  def capPerGroup(df: DataFrame, groupCol: String, orderCol: String,
                  n: Int): DataFrame = {
    val tieBreak = pmod(hash(df.columns.map(col).toSeq: _*), lit(1 << 30))
    val w = Window.partitionBy(groupCol).orderBy(col(orderCol), tieBreak)
    val rn = s"__rn_${java.util.UUID.randomUUID().toString.take(8)}"
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= n)
      .drop(rn)
  }

  /** Hot-group-safe exact per-group cap: keep the first `n` rows of
    * each group in (group, order, tie) order — [[capPerGroup]]'s
    * semantics without its per-group window. Rank-within-group is the
    * inclusive running COUNT from
    * [[GlobalOrder.withRunningTotalPerKey]]'s range shuffle +
    * per-partition boundary stats + O(p) driver stitch, so a group
    * holding half the corpus spreads over the range partitions instead
    * of sorting in one task. Requires LongType group/order columns (the
    * stitch contract); `tieCols` must make (group, order, tie) a total
    * order or the kept set is not well-defined.
    */
  def capPerGroupBig(df: DataFrame, groupCol: String, orderCol: String,
                     n: Int, tieCols: Seq[Column]): DataFrame = {
    require(n >= 0, s"cap must be >= 0, got $n")
    GlobalOrder.withRunningTotalPerKey(
        df.withColumn("__graft_one", lit(1L)), groupCol, orderCol,
        "__graft_one", tieCols, out = "__graft_rank")
      .filter(col("__graft_rank") <= n)
      .drop("__graft_one", "__graft_rank")
  }

  /** Token-budget greedy selection (the corpus-curation step after
    * scoring: "take the best documents until the token budget is
    * spent"): rows are taken in `sortCols` order, accumulating the
    * LongType `tokensCol`, and a row is kept while the INCLUSIVE running
    * total stays ≤ `budget` — i.e. the maximal score-ordered prefix that
    * fits. Equivalent to filtering on
    * `sum(tokens).over(Window.orderBy(sortCols)) <= budget`, but built on
    * [[GlobalOrder.withRunningTotal]]'s range-partitioned prefix scan, so
    * no single executor ever holds the global order. `sortCols` must
    * include a unique tiebreaker or the selected set is not well-defined.
    */
  def selectWithinBudget(df: DataFrame, sortCols: Seq[Column],
                         tokensCol: String, budget: Long,
                         out: String = "running_tokens"): DataFrame =
    GlobalOrder.withRunningTotal(df, sortCols, tokensCol, out)
      .filter(col(out) <= budget)
}
