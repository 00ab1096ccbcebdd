package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming operators over the `events` shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference only streams at the transport layer (Arrow Flight record
  * batches — SURVEY.md §2.10); these operators are the engine-level stream
  * processing a large-scale deployment adds on top: watermarked tumbling
  * windows, session windows, and custom keyed state. All are expressed on
  * the streaming Dataset API so the same code runs on a bounded batch
  * DataFrame (for tests/backfills) and an unbounded source.
  *
  * Scale notes: watermarks bound state size (late data beyond 10 min is
  * dropped rather than held forever); aggregations shuffle by
  * (window, key) which Spark's state store partitions by
  * `spark.sql.shuffle.partitions` — at 1000 executors, state is spread
  * across partitions and compacted per micro-batch via RocksDB (config,
  * not code).
  */
object EventStream {

  /** Tumbling 1-hour windows per event type with a 10-minute watermark. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("value_sum"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("value_sum"))

  /** SLIDING windows per event type: `size`-long windows starting every
    * `slide` (an event lands in size/slide overlapping windows — the
    * trending-now shape tumbling windows can't express). Same watermark
    * discipline as [[hourlyCounts]]; state is (window, key)-partitioned
    * and each event fans out to size/slide state rows, so the slide ratio
    * is the state-volume knob at scale.
    */
  def slidingCounts(events: DataFrame, size: String = "1 hour",
                    slide: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), size, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("value_sum"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("value_sum"))

  /** Session windows per user: events within a 30-minute gap fuse into one
    * session; emits per-session event count and value total.
    */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("value_sum"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("value_sum"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, value_sum: Double)

  /** Custom keyed state via mapGroupsWithState: per-user running totals
    * across micro-batches (the escape hatch for semantics windowed aggs
    * can't express). State eviction for abandoned keys would use a
    * GroupStateTimeout in production; kept timeout-free here so bounded
    * runs drain deterministically.
    */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          val (n, v) = batch.foldLeft((prev.n_events, prev.value_sum)) {
            case ((cn, cv), e) => (cn + 1, cv + e.value)
          }
          val next = UserRunning(uid, n, v)
          state.update(next)
          next
      }
  }

  final case class Ping(user_id: Long, tsu: Long, event_id: Long,
                        ts: Timestamp)
  // public: the state encoder's generated code instantiates it reflectively
  final case class LastSeen(tsu: Long)

  /** Streaming burst throttle via flatMapGroupsWithState: emit only the
    * events that OPEN a burst — those farther than `gapUs` from the same
    * user's previous event (kept or not) — the streaming twin of the
    * batch gap-sessionizer's session-start set, so one lag-window oracle
    * gates both (q173/q179). State per user is ONE timestamp; each
    * micro-batch's per-user slice is sorted by (tsu, event_id) before
    * the scan (iterator order within a batch is not event-time order).
    * That per-batch sort buffers a user's batch slice in memory — the
    * accepted cost of arbitrary stateful streaming.
    *
    * State is EVENT-TIME bounded, not lifetime-user bounded: `ts` (the
    * timestamp twin of `tsu`) carries a `watermarkDelay` watermark, and
    * each user's state expires once the watermark passes last-seen +
    * `gapUs` — at that point any event the state could still suppress
    * (tsu ≤ last + gap) would be later than the watermark contract
    * admits, so expiry cannot change a verdict and the lag-window oracle
    * is unaffected. Without the timeout the state store grows with
    * LIFETIME user cardinality — the unbounded-state pattern every other
    * operator here avoids.
    *
    * Cross-batch ordering: the per-user high-water mark is monotonic
    * (`max(state, batch)`), so a late event delivered in a later
    * micro-batch cannot rewind state and corrupt future verdicts; within
    * its own batch a late event is judged against the state it finds —
    * the documented in-order-delivery contract, the same trade the
    * watermark makes.
    */
  def throttledPings(pings: Dataset[Ping], gapUs: Long,
                     watermarkDelay: String = "10 minutes"): Dataset[Ping] = {
    import pings.sparkSession.implicits._
    pings
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastSeen, Ping](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, batch: Iterator[Ping], state: GroupState[LastSeen]) =>
          if (state.hasTimedOut) {
            // watermark has passed last-seen + gap: no admissible event
            // can still be suppressed by this state
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toArray.sortBy(p => (p.tsu, p.event_id))
            var last: Option[Long] = state.getOption.map(_.tsu)
            val kept = sorted.filter { p =>
              val keep = last.forall(l => p.tsu - l > gapUs)
              // monotonic high-water mark: never rewind on late arrivals
              last = Some(last.map(math.max(_, p.tsu)).getOrElse(p.tsu))
              keep
            }
            last.foreach { l =>
              state.update(LastSeen(l))
              // re-armed on every update; fires when watermark > this
              state.setTimeoutTimestamp(l / 1000L + gapUs / 1000L + 1L)
            }
            kept.iterator
          }
      }
  }

  /** MEASUREMENT-ONLY A/B twin of [[throttledPings]] with the bounded-state
    * machinery removed: no watermark, no event-time timeout, state lives
    * for the lifetime of the user key. Identical keep/suppress verdicts on
    * in-order bounded input; state grows with LIFETIME user cardinality,
    * which is exactly the unbounded-state pattern the production operator
    * exists to avoid — so this is NOT an operator, it is the control arm
    * of [[graft.queries.ThrottleAB]]'s cost decomposition (round-11
    * verdict: attribute q179's 1.96 → 6.93 s regression to harness
    * contention vs the TTL machinery's real per-batch work).
    */
  private[graft] def throttledPingsUnboundedState(pings: Dataset[Ping],
      gapUs: Long): Dataset[Ping] = {
    import pings.sparkSession.implicits._
    pings
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastSeen, Ping](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, batch: Iterator[Ping], state: GroupState[LastSeen]) =>
          val sorted = batch.toArray.sortBy(p => (p.tsu, p.event_id))
          var last: Option[Long] = state.getOption.map(_.tsu)
          val kept = sorted.filter { p =>
            val keep = last.forall(l => p.tsu - l > gapUs)
            last = Some(last.map(math.max(_, p.tsu)).getOrElse(p.tsu))
            keep
          }
          last.foreach(l => state.update(LastSeen(l)))
          kept.iterator
      }
  }

  /** A gap alert: user `user_id` was silent from `prev_tsu` to `tsu`
    * (strictly longer than the configured gap), detected when the
    * closing event arrived.
    */
  final case class GapAlert(user_id: Long, prev_tsu: Long, tsu: Long,
                            gap_us: Long)

  /** Streaming silence/heartbeat-loss detection: emit an alert for every
    * pair of CONSECUTIVE events of a user separated by more than
    * `gapUs` — the monitoring primitive behind "this device went quiet
    * for an hour". Alerts fire on the CLOSING event (the one that ends
    * the silence), which keeps the semantics exact on both engines: the
    * batch twin is one lag window, and the bounded gate hash-compares
    * the two (a timeout-fired alert would depend on watermark arrival
    * timing — observable, but not oracle-comparable).
    *
    * State is ONE timestamp per user, event-time bounded exactly as
    * [[throttledPings]]: the watermark expires a user once no
    * admissible event could still close a gap against the stored
    * timestamp... which for gap DETECTION means state older than the
    * watermark can be dropped because any event arriving later than the
    * watermark against it would be late beyond the contract anyway —
    * the documented trade (a gap closed by very late data is lost with
    * its state). Same per-batch slice sort and monotonic high-water
    * mark as the throttle.
    */
  def gapAlerts(pings: Dataset[Ping], gapUs: Long,
                watermarkDelay: String = "10 minutes"): Dataset[GapAlert] = {
    import pings.sparkSession.implicits._
    pings
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastSeen, GapAlert](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[Ping], state: GroupState[LastSeen]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toArray.sortBy(p => (p.tsu, p.event_id))
            var last: Option[Long] = state.getOption.map(_.tsu)
            val alerts = sorted.flatMap { p =>
              val out = last match {
                case Some(l) if p.tsu - l > gapUs =>
                  Some(GapAlert(user, l, p.tsu, p.tsu - l))
                case _ => None
              }
              last = Some(last.map(math.max(_, p.tsu)).getOrElse(p.tsu))
              out
            }
            last.foreach { l =>
              state.update(LastSeen(l))
              state.setTimeoutTimestamp(l / 1000L + gapUs / 1000L + 1L)
            }
            alerts.iterator
          }
      }
  }

  private val DayUs = 86400000000L

  /** One typed event for the forecast monitor: integer cents, micros,
    * and the timestamp twin that carries the watermark. */
  final case class TypedCents(event_type: String, tsu: Long,
                              event_id: Long, cents: Long, ts: Timestamp)
  // public: the state encoder's generated code instantiates these
  // reflectively
  final case class DayLedger(totals: Map[Long, Long], closedUpTo: Long)
  final case class ForecastAlert(event_type: String, day: Long,
                                 total_cents: Long, prev_cents: Long)

  /** Streaming seasonal-naive forecast monitor: per event type, when a
    * day CLOSES (the first event of a later day arrives), compare its
    * total against the total 7 days earlier and alert when it deviates
    * by more than 50% (|y − ŷ|·2 > ŷ, exact integers) — the streaming
    * twin of the batch backtest's residual screen
    * ([[graft.ext.TimeSeries.seasonalNaiveBacktest]]), with q273/q285
    * gating the shared semantics. Alerting on the CLOSING event (the
    * [[gapAlerts]] rule) keeps the bounded run hash-equal to the batch
    * twin; a timeout-fired close would depend on watermark arrival
    * timing.
    *
    * State per type is ONE day-ledger bounded by construction: only the
    * newest day is ever open (every older day closes the moment a later
    * event arrives), and closed days older than newest − 8 are pruned —
    * a closed day is only ever read again as the 7-day-back forecast
    * base. So state is ≤ 9 (day, total) pairs per key regardless of
    * stream length, plus the same event-time timeout discipline as
    * [[throttledPings]] for abandoned keys. Same per-batch slice sort
    * and in-order-across-batches contract as the other custom-state
    * operators.
    */
  def forecastAlerts(events: Dataset[TypedCents],
                     watermarkDelay: String = "10 minutes")
      : Dataset[ForecastAlert] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[DayLedger, ForecastAlert](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (typ: String, batch: Iterator[TypedCents],
         state: GroupState[DayLedger]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toArray.sortBy(e => (e.tsu, e.event_id))
            var totals = state.getOption.map(_.totals)
              .getOrElse(Map.empty[Long, Long])
            var closedUpTo = state.getOption.map(_.closedUpTo)
              .getOrElse(Long.MinValue)
            var lastTsu = 0L
            val alerts = Seq.newBuilder[ForecastAlert]
            sorted.foreach { e =>
              val day = Math.floorDiv(e.tsu, DayUs)
              // close every still-open older day (at most one: the
              // previous maximum) before folding this event in
              totals.keys.filter(k => k < day && k > closedUpTo)
                .toSeq.sorted.foreach { k =>
                  val y = totals(k)
                  totals.get(k - 7L).foreach { p =>
                    if (math.abs(y - p) * 2L > p)
                      alerts += ForecastAlert(typ, k, y, p)
                  }
                }
              closedUpTo = math.max(closedUpTo, day - 1L)
              totals = totals.updated(day,
                totals.getOrElse(day, 0L) + e.cents)
              if (totals.size > 9)
                totals = totals.filter(_._1 >= day - 8L)
              lastTsu = math.max(lastTsu, e.tsu)
            }
            if (sorted.nonEmpty) {
              state.update(DayLedger(totals, closedUpTo))
              // expire once the watermark is 9 days past last activity:
              // nothing the ledger holds can still close with an alert
              state.setTimeoutTimestamp(lastTsu / 1000L +
                9L * (DayUs / 1000L))
            }
            alerts.result().iterator
          }
      }
  }

  /** Streaming exact dedup: drop events whose `event_id` was already seen,
    * keeping state only within the watermark horizon — the streaming twin
    * of batch exact dedup, with bounded state (late duplicates beyond the
    * watermark are the accepted trade for not holding all history).
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each purchase matched to the same
    * user's clicks in the preceding hour (last-touch-style attribution).
    * Both sides carry a watermark and the join condition bounds event
    * time, so each side's join STATE is evicted once the other side's
    * watermark passes — the state store holds one hour of events, not the
    * stream's history, which is what makes a stream-stream join runnable
    * forever at production rates. Inner join in Append mode: rows emit as
    * they match; on bounded input the result equals the batch interval
    * join, which is how the driver gate checks it (q89).
    */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    purchases.join(clicks, expr(
      """p_user = c_user AND
         click_ts BETWEEN purchase_ts - INTERVAL 1 HOUR AND purchase_ts"""))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"))
  }

  /** Stream-static enrichment: left-join each micro-batch against a
    * static (batch) dimension table on `key`. Stateless — no watermark,
    * no state store; the static side is broadcast into every micro-batch
    * (and re-read per batch, so a warehouse-backed dimension picks up
    * updates between batches). This is the "attach user/account metadata
    * to the event stream" shape every streaming pipeline starts with; at
    * production rates the only sizing rule is that the dimension fits a
    * broadcast — beyond that, drop the hint and let the join shuffle the
    * batch side.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    events.join(broadcast(dim), Seq(key), "left")
  }

  /** Micro-batch warehouse sink: the built-in parquet file sink, which is
    * exactly-once — committed files are tracked in the `_spark_metadata`
    * manifest, so a batch replayed after a mid-commit crash never double
    * counts (a hand-rolled foreachBatch append would be at-least-once).
    */
  def toParquetWarehouse(df: DataFrame, outDir: String,
                         checkpointDir: String)
  : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Convenience: run a streaming transform to completion against a memory
    * sink and return the result table (for tests and bounded backfills).
    *
    * `statePartitions` sizes the state store for THIS query (read from
    * `spark.sql.shuffle.partitions` at stream start, then restored):
    * state-partition count should track key cardinality — tiny keyed
    * state spread over many partitions pays per-partition store/commit
    * overhead for nothing, exactly like over-provisioned state stores on
    * a real cluster.
    */
  def runToMemory(df: DataFrame, name: String,
                  outputMode: OutputMode = OutputMode.Complete(),
                  statePartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    statePartitions.foreach(p => spark.conf.set(key, p.toString))
    try {
      val q = df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(outputMode)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally statePartitions.foreach(_ => spark.conf.set(key, prev))
    df.sparkSession.table(name)
  }

  /** [[runToMemory]] with a durable CHECKPOINT: state, offsets, and
    * commits live under `checkpointDir`, so a later invocation with the
    * SAME checkpoint dir (and a fresh sink name) resumes from the state
    * store instead of reprocessing — already-committed source files are
    * skipped and the restored aggregation state keeps accumulating. This
    * is the restart-recovery seam a production incremental pipeline
    * rides: the memory sink is ephemeral by design (Complete mode
    * re-emits the full state table on every trigger), but the STATE is
    * the durable artifact, which is exactly what the q349 gate and the
    * kill-restart test pin.
    */
  def runToMemoryCheckpointed(df: DataFrame, name: String,
                              checkpointDir: String,
                              outputMode: OutputMode = OutputMode.Complete(),
                              statePartitions: Option[Int] = None)
  : DataFrame = {
    val spark = df.sparkSession
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    statePartitions.foreach(p => spark.conf.set(key, p.toString))
    try {
      val q = df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(outputMode)
        .option("checkpointLocation", checkpointDir)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally statePartitions.foreach(_ => spark.conf.set(key, prev))
    df.sparkSession.table(name)
  }
}
