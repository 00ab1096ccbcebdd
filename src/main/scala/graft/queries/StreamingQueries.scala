package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.EventStream

/** Streaming-vs-batch parity: the SAME streaming operator users run
  * unbounded (`EventStream.hourlyCounts` — watermarked tumbling windows)
  * is executed here over the events table as a bounded file stream
  * (AvailableNow micro-batches into a memory sink), and its result is
  * hash-compared against a plain batch SQL oracle. This is the strongest
  * claim a streaming operator can make: identical answers to the batch
  * semantics, not just "rows came out".
  */
object StreamingQueries {

  private[queries] val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), // ts read as long (nanosAsLong)
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q53_streaming_hourly" -> ((s, dir) => {
      graft.engine.Readers.enableNanosAsLong(s)
      // the file stream source requires a DIRECTORY; expose the single
      // parquet file through a symlink in a scratch dir
      val streamDir = java.nio.file.Files.createTempDirectory("q53_events")
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(dir).toAbsolutePath
          .resolve("events.parquet"))
      val stream = s.readStream
        .schema(eventsSchema)
        .parquet(streamDir.toString)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val name = "q53_mem_" + java.util.UUID.randomUUID().toString.replace("-", "")
      // ~720 hour-windows x ~5 event types of state: 8 partitions, not 32
      val out = EventStream.runToMemory(
        EventStream.hourlyCounts(stream), name, statePartitions = Some(8))
      out.select(col("window_start"), col("event_type"), col("n"),
        round(col("value_sum"), 2).as("value_sum"))
        .orderBy("window_start", "event_type")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q53_streaming_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
                event_type, count(*) AS n,
                round(sum(value), 2) AS value_sum
         FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"""
  )
}
