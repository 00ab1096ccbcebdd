package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed total-order operators.
  *
  * `Window.orderBy(...)` with no partition key collapses the whole dataset
  * into ONE partition (Spark even warns), so global row numbers / ntile via
  * WindowExec cannot scale past a single executor's memory. These operators
  * compute the same results with the classic scalable recipe instead:
  * range-repartition on the sort key, sort within partitions, then assign
  * contiguous per-partition index ranges from a small count-per-partition
  * job (RDD `zipWithIndex`). Three distributed passes instead of one
  * single-node pass — at 100 TB that is the difference between a plan that
  * runs and a plan that OOMs the one unlucky executor.
  *
  * The sort columns MUST form a total order (include a unique tiebreaker):
  * range boundaries are only deterministic when no two rows compare equal.
  */
object GlobalOrder {

  /** Range-sort `df` on `sortCols` and number rows 1..n in that order.
    * Returns the numbered DataFrame plus the total row count (free — it
    * falls out of the per-partition count job, so callers that need n,
    * like ntile, don't pay a third pass).
    */
  private def numbered(df: DataFrame, sortCols: Seq[Column], out: String,
                       partitions: Int): (DataFrame, Long) = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
    else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = StructType(
      sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    // persist the sorted rows so the range shuffle + sort runs ONCE: the
    // count job below fills the cache and the numbering job reads it back
    // (spill-safe). Spark's ContextCleaner unpersists the blocks once the
    // numbered result's lineage is dropped by the caller.
    val rdd0 = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // job 1: count per partition -> contiguous index offsets in range order
    val counts = rdd0
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    // job 2: assign 1-based numbers
    val rdd = rdd0.mapPartitionsWithIndex { (i, it) =>
      var r = offsets(i)
      it.map { row => r += 1; Row.fromSeq(row.toSeq :+ r) }
    }
    (spark.createDataFrame(rdd, schema), counts.sum)
  }

  /** Append a 1-based global row number in the total order of `sortCols`.
    * Scales: no single-partition window; ordering work is a range shuffle.
    */
  def withRowNumber(df: DataFrame, sortCols: Seq[Column],
                    out: String = "rn", partitions: Int = 0): DataFrame =
    numbered(df, sortCols, out, partitions)._1

  /** Append an inclusive running total of the LongType column `valueCol`
    * in the total order of `sortCols` — same semantics as
    * `sum(valueCol).over(Window.orderBy(sortCols))` but scalable: the
    * single-partition WindowExec is replaced by a range shuffle, a small
    * per-partition-sums job (p longs to the driver), and a per-partition
    * prefix scan. This is the primitive behind corpus-order sequence
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
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
    else spark.sessionState.conf.numShufflePartitions
    val vi = df.schema.fieldIndex(valueCol)
    require(df.schema(vi).dataType == LongType,
      s"withRunningTotal needs a LongType value column; " +
        s"$valueCol is ${df.schema(vi).dataType}")
    val sorted = df.repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = StructType(
      sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    val rdd0 = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def v(row: Row): Long = if (row.isNullAt(vi)) 0L else row.getLong(vi)
    // job 1: per-partition sums -> prefix offsets in range order
    val sums = rdd0
      .mapPartitionsWithIndex((i, it) =>
        Iterator((i, it.foldLeft(0L)((acc, r) => acc + v(r)))))
      .collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(0L)(_ + _)
    // job 2: per-partition prefix scan seeded with the offset
    val rdd = rdd0.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { row => acc += v(row); Row.fromSeq(row.toSeq :+ acc) }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Exact NTILE(k) over a total order, same semantics as
    * `ntile(k).over(Window.orderBy(sortCols))`: with n rows, the first
    * n % k buckets get one extra row. Distributed (no single-partition
    * window); costs one extra count job over the input.
    */
  def withNtile(df: DataFrame, k: Int, sortCols: Seq[Column],
                out: String = "bucket", partitions: Int = 0): DataFrame = {
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
