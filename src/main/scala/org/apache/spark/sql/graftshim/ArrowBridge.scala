package org.apache.spark.sql.graftshim

import java.io.ByteArrayInputStream
import java.nio.channels.Channels

import org.apache.arrow.vector.ipc.ReadChannel
import org.apache.arrow.vector.ipc.message.MessageSerializer
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.arrow.ArrowConverters
import org.apache.spark.sql.util.ArrowUtils

/** Arrow IPC wire bridge (SURVEY.md §2.1 S4/S7): the reference ships
  * record batches over Arrow Flight (`serve_flight.py:148,330`); this
  * exposes the same wire format from Spark — each element is one Arrow
  * IPC batch WITH embedded schema, produced distributed (one stream per
  * partition) and collected at the driver, which is exactly a Flight
  * do_get payload. Uses Spark's internal ArrowConverters (the machinery
  * behind toPandas), hence lives in the graftshim access package.
  */
object ArrowBridge {

  /** DataFrame -> Arrow IPC batches (schema embedded in each batch).
    * Always returns at least one (possibly empty) batch so the schema
    * survives a zero-row round trip.
    */
  def toArrowBatches(df: DataFrame,
                     maxRecordsPerBatch: Long = 10000): Array[Array[Byte]] = {
    val schema = df.schema
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    val batches = df.queryExecution.toRdd.mapPartitions { it =>
      // signature: (rowIter, schema, maxRecordsPerBatch,
      //             maxEstimatedBatchSize, timeZoneId, ...)
      ArrowConverters.toBatchWithSchemaIterator(
        it, schema, maxRecordsPerBatch, Long.MaxValue, tz,
        true /* errorOnDuplicatedFieldNames */, false /* largeVarTypes */)
    }.collect()
    if (batches.nonEmpty) batches
    else Array(ArrowConverters.createEmptyArrowBatch(schema, tz, true, false))
  }

  /** DataFrame -> Arrow IPC batches as a lazily-pulled iterator: the
    * size-safe sibling of [[toArrowBatches]] for FULL exports.
    * `toLocalIterator` fetches one partition's batches at a time, so
    * driver memory is bounded by the largest partition rather than the
    * whole result — the shape a Flight do_get stream wants (batches are
    * written to the wire as they arrive). Trade: one job per partition
    * instead of one job total, invisible at transport latencies.
    */
  def toArrowBatchIterator(df: DataFrame,
                           maxRecordsPerBatch: Long = 10000): Iterator[Array[Byte]] = {
    val schema = df.schema
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    val it = df.queryExecution.toRdd.mapPartitions { rows =>
      ArrowConverters.toBatchWithSchemaIterator(
        rows, schema, maxRecordsPerBatch, Long.MaxValue, tz, true, false)
    }.toLocalIterator
    if (it.hasNext) it
    else Iterator(ArrowConverters.createEmptyArrowBatch(schema, tz, true, false))
  }

  /** Arrow IPC batches (schema embedded) -> DataFrame. The schema is read
    * driver-side from the first batch; row decoding runs distributed
    * (batch bytes are parallelized, same shape as Spark's own
    * ArrowConverters.toDataFrame) so large payloads never materialize as
    * rows on the driver.
    */
  def fromArrowBatches(spark: SparkSession,
                       batches: Array[Array[Byte]]): DataFrame = {
    require(batches.nonEmpty,
      "no Arrow batches: the sender must emit at least one (empty) batch")
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // Read the schema straight from the head batch's IPC schema message.
    // (Probing via fromBatchWithSchemaIterator would leak its Arrow
    // allocator unless the row iterator is fully drained: with a null
    // TaskContext, closeAll only runs on exhaustion.)
    val arrowSchema = MessageSerializer.deserializeSchema(new ReadChannel(
      Channels.newChannel(new ByteArrayInputStream(batches.head))))
    val schema = ArrowUtils.fromArrowSchema(arrowSchema)
    val rdd = cs.sparkContext
      .parallelize(batches.toIndexedSeq,
        math.max(1, math.min(batches.length, 32)))
      .mapPartitions { it =>
        ArrowConverters.fromBatchWithSchemaIterator(it, TaskContext.get())._1
      }
    cs.internalCreateDataFrame(rdd, schema, isStreaming = false)
  }
}
