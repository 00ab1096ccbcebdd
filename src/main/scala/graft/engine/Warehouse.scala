package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support for co-located joins (SURVEY.md §7.2 PR5 /
  * "Partitioning & shuffle" in the build brief).
  *
  * Repeated large-table joins on a stable key (lineitem ⋈ orders on
  * orderkey every report run) pay a full shuffle of both sides each time.
  * Writing both tables bucketed by the join key into the warehouse makes
  * the partitioning part of the table layout: Spark's scan reports the
  * bucketing as the output partitioning, and the sort-merge join plans
  * with NO Exchange on either side — verified in WarehouseSuite by
  * asserting the physical plan is exchange-free. At 100 TB this converts
  * the dominant recurring shuffle into a one-time layout cost.
  */
object Warehouse {

  /** Write `df` as a bucketed managed table (overwrite semantics match the
    * pipeline's FULL materialization).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — shuffle-free when both
    * were written with the same bucket count on the join column.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
