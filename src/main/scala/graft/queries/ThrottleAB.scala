package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B cost decomposition for the q179 streaming throttle (round-11
  * verdict task 1b): the driver artifact showed q179 going 1.96 → 6.93 s
  * the round the throttle gained its watermark + event-time-timeout
  * state bound, on a box that was also visibly contended — two candidate
  * causes with no measurement separating them. This main runs the EXACT
  * q179 pipeline (same bounded file-stream harness, same memory sink,
  * same 8 state partitions) with the production bounded-state throttle
  * (watermark + `EventTimeTimeout` + per-user timeout registration) and
  * with the measurement-only unbounded twin
  * ([[graft.streaming.EventStream.throttledPingsUnboundedState]]), N
  * reps each, interleaved so a box-wide stall cannot poison one arm.
  * The min-per-arm difference IS the TTL machinery's real cost; the
  * spread within an arm is the box. Results are recorded in
  * docs/PLANS.md.
  *
  * Usage: runMain graft.queries.ThrottleAB [sfDir] [reps]
  */
object ThrottleAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def run(bounded: Boolean): Double = {
      val t0 = System.nanoTime()
      val df = StreamingQueries.runEventsStream(spark, sfDir, "ab_events") {
        raw =>
          import spark.implicits._
          val pings = raw
            .select(col("user_id"), expr("ts div 1000").as("tsu"),
              col("event_id"),
              timestamp_micros(expr("ts div 1000")).as("ts"))
            .as[graft.streaming.EventStream.Ping]
          val throttled =
            if (bounded)
              graft.streaming.EventStream.throttledPings(pings, 5000000L)
            else
              graft.streaming.EventStream
                .throttledPingsUnboundedState(pings, 5000000L)
          val out = graft.streaming.EventStream.runToMemory(
            throttled.toDF(), StreamingQueries.memName("ab_mem_"),
            outputMode = org.apache.spark.sql.streaming.OutputMode.Append(),
            statePartitions = Some(8))
          out.groupBy("user_id").agg(count(lit(1)).as("n_kept"))
            .orderBy("user_id")
      }
      df.queryExecution.toRdd.foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    }

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", v)
    val bT = scala.collection.mutable.ArrayBuffer.empty[Double]
    val uT = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (r <- 1 to reps) {
      bT += run(bounded = true)
      uT += run(bounded = false)
      println(s"[throttle-ab] rep $r bounded=${fmt(bT.last)} " +
        s"unbounded=${fmt(uT.last)}")
    }
    println(s"""{"metric":"throttle_ab","sf":"$sfDir","reps":$reps,""" +
      s""""bounded":[${bT.map(fmt).mkString(",")}],""" +
      s""""unbounded":[${uT.map(fmt).mkString(",")}],""" +
      s""""bounded_min":${fmt(bT.min)},"unbounded_min":${fmt(uT.min)},""" +
      s""""ttl_cost_sec":${fmt(bT.min - uT.min)}}""")
    spark.stop()
  }
}
