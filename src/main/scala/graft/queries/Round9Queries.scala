package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Readers
import graft.ext.{GlobalOrder, Stats}

/** Round-9 batch: hot-key-safe formulations of per-key timeline
  * operators. Floats in compared columns follow the q110 discipline
  * (exact integer aggregates only).
  */
object Round9Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Readers.table(s, dir, name)

  /** events with the nanosecond timestamp read as long and converted
    * (the q38 recipe — Spark cannot scan TIMESTAMP(NANOS) directly).
    */
  private def events(s: SparkSession, dir: String): DataFrame =
    Readers.eventsNanos(s, dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** q147 session gap (30 min in epoch micros — q38's constant). */
  private val SessionGapUs = 30L * 60 * 1000000

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gap sessionization WITHOUT the per-user window: global session ids
    // via the GlobalOrder range shuffle (two jobs, one shuffle) — the
    // hot-key-safe twin of q38 (whose lag/sum-over-partitionBy(user)
    // buffers a hot user's whole timeline in one task). Session ids are
    // global in (user, ts, event) order, so the oracle's running sum
    // over that total order reproduces them exactly.
    "q147_sessionize_scalable" -> ((s, dir) => {
      val ev = events(s, dir).select(
        col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsu"),
        Stats.cents(col("value")).as("value_cents"))
      GlobalOrder.withSessionId(ev, "user_id", "tsu", SessionGapUs,
        Seq(col("event_id")))
        .groupBy("session_id", "user_id")
        .agg(count(lit(1)).as("n_events"),
          min("tsu").as("start_us"), max("tsu").as("end_us"),
          sum("value_cents").as("value_cents"))
        .orderBy("session_id")
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q147_sessionize_scalable" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
               FROM events),
          g AS (SELECT user_id, event_id, tsu, value_cents,
                  CASE WHEN lag(tsu) OVER w IS NULL
                       OR tsu - lag(tsu) OVER w > $SessionGapUs
                       THEN 1 ELSE 0 END AS brk
                FROM e
                WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
          s AS (SELECT user_id, tsu, value_cents,
                  CAST(sum(brk) OVER (ORDER BY user_id, tsu, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
                FROM g)
          SELECT session_id, user_id, count(*) AS n_events,
                 min(tsu) AS start_us, max(tsu) AS end_us,
                 CAST(sum(value_cents) AS BIGINT) AS value_cents
          FROM s GROUP BY 1, 2 ORDER BY session_id"""
  )
}
