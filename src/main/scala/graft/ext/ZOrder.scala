package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-column data skipping — the
  * storage-layout lever [[graft.engine.Warehouse]]'s Hive partitioning
  * (one low-cardinality column) and bucketing (one join key) don't
  * cover: interleaving the bits of two range-queried columns gives ONE
  * sort key whose contiguous ranges are small rectangles in (x, y)
  * space, so range-partitioned, z-sorted files have tight per-file
  * min/max on BOTH columns and parquet row-group/file statistics prune
  * 2-D rectangle predicates — the technique Delta/Iceberg expose as
  * OPTIMIZE ZORDER BY.
  *
  * The z-value is a pure integer bit-interleave (sum of disjoint bits),
  * bit-identical in any engine — the computation itself is oracle-gated
  * (q144), the layout is verified result-invisible the q121/q122 way,
  * and file-span disjointness is asserted in the suite.
  */
object ZOrder {

  /** 2-D Morton code over the low `bits` bits of two NON-NEGATIVE
    * integer columns: bit i of x lands at position 2i, bit i of y at
    * 2i+1. Inputs must already be range-reduced (e.g. `% (1 << bits)`);
    * summing disjoint powers of two is exact integer arithmetic, so the
    * expression reproduces anywhere.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)),
          2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** The DuckDB twin of [[zValue]] (same term order). */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})",
        s"((($y >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")

  /** Write `df` z-clustered on (x, y): a `z` column is appended, rows
    * are RANGE-partitioned and sorted by it (each output file covers a
    * contiguous z-range ⇒ a small (x, y) rectangle). `partitions` sets
    * the file count — at warehouse scale, size it to the target file
    * size, not the executor count.
    */
  def writeZOrdered(df: DataFrame, dir: String, x: Column, y: Column,
                    bits: Int, partitions: Int): Unit =
    df.withColumn("z", zValue(x, y, bits))
      .repartitionByRange(partitions, col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite").parquet(dir)
}
