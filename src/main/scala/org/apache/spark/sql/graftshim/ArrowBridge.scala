package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.arrow.ArrowConverters

/** Arrow IPC wire bridge (SURVEY.md §2.1 S4/S7): the reference ships
  * record batches over Arrow Flight (`serve_flight.py:148,330`); this
  * exposes the same wire format from Spark — each element is one Arrow
  * IPC batch WITH embedded schema, produced distributed (one stream per
  * partition) and collected at the driver, which is exactly a Flight
  * do_get payload. Uses Spark's internal ArrowConverters (the machinery
  * behind toPandas), hence lives in the graftshim access package.
  */
object ArrowBridge {

  /** DataFrame -> Arrow IPC batches (schema embedded in each batch). */
  def toArrowBatches(df: DataFrame,
                     maxRecordsPerBatch: Long = 10000): Array[Array[Byte]] = {
    val schema = df.schema
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    df.queryExecution.toRdd.mapPartitions { it =>
      ArrowConverters.toBatchWithSchemaIterator(
        it, schema, Long.MaxValue, maxRecordsPerBatch, tz,
        true /* errorOnDuplicatedFieldNames */, false /* largeVarTypes */)
    }.collect()
  }

  /** Arrow IPC batches (schema embedded) -> DataFrame. The schema travels
    * in the batches, so the receiver needs no side-channel contract.
    */
  def fromArrowBatches(spark: SparkSession,
                       batches: Array[Array[Byte]]): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val (it, schema) =
      ArrowConverters.fromBatchWithSchemaIterator(batches.iterator, null)
    // copy: the iterator reuses its UnsafeRow buffer per element
    val rows = it.map(_.copy()).toArray
    cs.internalCreateDataFrame(
      cs.sparkContext.parallelize(rows.toIndexedSeq,
        math.max(1, math.min(rows.length, 8))),
      schema, isStreaming = false)
  }
}
