package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._

import java.sql.Timestamp

/** Structured Streaming surface over the `events` schema (north-star
  * extension — the reference has NO streaming, SURVEY.md §2.12; the
  * batch twins with DuckDB oracles are in graft.queries.Events).
  *
  * Scale notes: event-time windows + watermarks bound state size; the
  * sessionizer keeps one small state object per active user key and
  * emits sessions on timeout, so state scales with concurrent users,
  * not event volume. Both run identically over Kafka/file streams —
  * the source is a parameter.
  */
object EventStreams {

  /** File-based event stream (parquet directory; swap for Kafka in prod).
    *
    * `readStream` needs an explicit schema, and the harness's `ts`
    * physical type has varied across testdata generations (see
    * Tables.events): TIMESTAMP(NANOS) — illegal for Spark's parquet
    * reader unless read as a raw long — in some, TIMESTAMP(MICROS) in
    * others. Probe the on-disk schema with one footer read (metadata
    * only, no data scan) and normalize `ts` to timestamp_ntz either way,
    * exactly mirroring the batch loader so stream/batch parity oracles
    * compare like for like.
    */
  def readEventStream(spark: SparkSession, dir: String,
                      options: Map[String, String] = Map.empty): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(fileSchema).options(options).parquet(dir)
    fileSchema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }

  /** Watermarked sliding-window counts per event type — the streaming
    * twin of q40/q44.
    */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     slide: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      // Watermarks require TIMESTAMP (LTZ); the harness data is NTZ —
      // UTC session makes the round-trip cast value-preserving.
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").cast("timestamp_ntz").as("win"),
        col("event_type"), col("n"), col("total"))

  /** Streaming exactly-once dedup: duplicate records (same key) within
    * the watermark horizon are dropped — the streaming twin of the batch
    * exact-dedup operator, with state bounded by the watermark instead
    * of growing with the stream. `dropDuplicatesWithinWatermark` dedups
    * on the KEY alone (a replay with the same key but different event
    * time is still a duplicate), exactly the batch semantics.
    */
  def dedupStream(events: DataFrame, keyCol: String,
                  watermark: String = "1 hour"): DataFrame =
    events
      .withColumn("_ts", col("ts").cast("timestamp"))
      .withWatermark("_ts", watermark)
      .dropDuplicatesWithinWatermark(keyCol)
      .drop("_ts")

  // State/output track event time in MICROSECONDS: the event tables are
  // ns-precision (µs-truncated on read, see Tables.events), and a
  // millisecond java.sql.Timestamp would silently drop the µs digits the
  // cross-engine oracle compares (q87).
  final case class SessionState(startUs: Long, lastUs: Long, n: Long, total: Double)
  final case class SessionOut(user_id: Long, start_ts: Timestamp, end_ts: Timestamp,
                              n_events: Long, total: Double)

  final case class Ev(user_id: Long, ts: Timestamp, tsUs: Long, value: Double)

  /** Stream-stream INNER join: each click matched to the same user's
    * purchases within `window` after the click. Both sides carry
    * watermarks and the join predicate bounds event time in both
    * directions, so Spark can expire join state (clicks older than
    * watermark − window, purchases older than watermark) — the state
    * stays bounded by the window horizon, not the stream length.
    * Matches emit as soon as both rows arrive (inner join, append).
    */
  def clickPurchaseJoin(events: DataFrame, window: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame = {
    val base = events.withColumn("ts", col("ts").cast("timestamp"))
    val clicks = base.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("cts"))
      .withWatermark("cts", watermark)
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("pts"))
      .withWatermark("pts", watermark)
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr(s"INTERVAL $window"))
      .select(col("click_id"), col("purchase_id"), col("user_id"))
  }

  /** Stream-stream LEFT OUTER click⋈purchase — the stateful case the
    * inner join doesn't cover: an unmatched click can only be emitted
    * (with NULL purchase columns) once the WATERMARK proves no matching
    * purchase can still arrive — its join-window has closed. Same
    * two-sided time bounds as [[clickPurchaseJoin]], so state stays
    * bounded by the window horizon; the null rows trail real time by
    * the watermark delay, which is exactly the semantics a late-data-
    * tolerant attribution pipeline wants (count a click as unconverted
    * only when conversion is provably impossible).
    */
  def clickPurchaseOuterJoin(events: DataFrame, window: String = "1 hour",
                             watermark: String = "2 hours"): DataFrame = {
    val base = events.withColumn("ts", col("ts").cast("timestamp"))
    // Watermark-progress caveat: each side's watermark operator tracks
    // the max event time of rows reaching IT — and Catalyst pushes the
    // deterministic type filter below EventTimeWatermark regardless of
    // where it is written, so each side's watermark advances only on
    // events of ITS OWN type. In production both types flow
    // continuously; a replay/backfill harness must feed both sides'
    // tails (see q149's typed sentinels — an untyped flush sentinel is
    // filtered out before the watermark ever sees it, silently freezing
    // the last window+delay of null emissions).
    val clicks = base.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("cts"))
      .withWatermark("cts", watermark)
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("pts"))
      .withWatermark("pts", watermark)
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr(s"INTERVAL $window"),
      "left_outer")
      .select(col("click_id"), col("purchase_id"), col("user_id"))
  }

  private def usToTimestamp(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Stateful sessionization (flatMapGroupsWithState): a session closes
    * after `gapMs` of user inactivity in EVENT time — sessions end when
    * the watermark passes the session's last event + gap, so results are
    * reproducible across replays regardless of processing speed (the
    * production-correct form; a processing-time timeout would close
    * sessions on wall-clock stalls). The streaming twin of q41's
    * lag+cumsum batch sessionizer.
    *
    * State is one small object per ACTIVE user key — bounded by
    * concurrent users, not event volume; the watermark bounds how long a
    * silent key's state lives.
    */
  def sessionize(spark: SparkSession, events: DataFrame,
                 gapMs: Long = 30 * 60 * 1000L,
                 watermark: String = "30 minutes"): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMs * 1000L
    events.select(col("user_id"), col("ts").cast("timestamp").as("ts"),
      unix_micros(col("ts").cast("timestamp")).as("tsUs"),
      col("value")).as[Ev]
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, usToTimestamp(s.startUs),
              usToTimestamp(s.lastUs), s.n, s.total))
          } else {
            val sorted = evs.toSeq.sortBy(_.tsUs)
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.tsUs
              cur match {
                case Some(s) if t - s.lastUs <= gapUs =>
                  cur = Some(s.copy(lastUs = t, n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  closed += SessionOut(user, usToTimestamp(s.startUs),
                    usToTimestamp(s.lastUs), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // Close when the WATERMARK passes last+gap (event time);
              // the timeout must sit strictly beyond the current
              // watermark or Spark rejects it. Timeout granularity is ms;
              // ceil so a µs-tail session never times out early.
              state.setTimeoutTimestamp(
                math.max((s.lastUs + 999L) / 1000L + gapMs,
                  state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  final case class RunningCount(user_id: Long, n_events: Long)

  /** [[runningCounts]]'s processor — the transformWithState (Spark 4
    * arbitrary-state v2) form of a per-key running aggregate: one typed
    * `ValueState[Long]` per user, emitted once per key per micro-batch
    * as the RUNNING total. Running totals are monotone, so any
    * downstream `max(n_events)` per key equals the final count no
    * matter how the input was batched — the property the q294 oracle
    * leans on.
    */
  private class RunningCountProcessor
      extends StatefulProcessor[Long, Long, RunningCount] {
    @transient private var count: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Long],
                                 timers: TimerValues): Iterator[RunningCount] = {
      val prev = if (count.exists()) count.get() else 0L
      val c = prev + rows.size
      count.update(c)
      Iterator.single(RunningCount(key, c))
    }
  }

  final case class IdleFlag(user_id: Long, last_seen_ms: Long)

  /** [[idleUsers]]'s processor — transformWithState TIMERS in event
    * time: every batch re-arms one timer at `last_seen + idleMs`
    * (deleting the previous arm — at most ONE pending timer per key),
    * and when the WATERMARK passes an arm with no newer event, the
    * expiry callback emits the idle flag and clears the key's state.
    * State and timers are per ACTIVE key — the inactivity-alert /
    * session-abandonment primitive with bounded state.
    */
  private class IdleDetectProcessor(idleMs: Long)
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp),
        IdleFlag] {
    @transient private var lastSeen: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastSeen = getHandle.getValueState[Long]("last_seen",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: Long,
        rows: Iterator[(Long, java.sql.Timestamp)],
        timers: TimerValues): Iterator[IdleFlag] = {
      val prev = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
      var mx = prev
      rows.foreach { r => val t = r._2.getTime; if (t > mx) mx = t }
      lastSeen.update(mx)
      if (prev != Long.MinValue && prev != mx)
        getHandle.deleteTimer(prev + idleMs)
      getHandle.registerTimer(mx + idleMs)
      Iterator.empty
    }
    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[IdleFlag] = {
      val last = if (lastSeen.exists()) lastSeen.get() else -1L
      lastSeen.clear()
      Iterator.single(IdleFlag(key, last))
    }
  }

  /** Per-user INACTIVITY flags via transformWithState event-time
    * timers (the v2 twin of the sessionizer's timeout): a user with no
    * event for `idleMs` of EVENT time — i.e. the watermark passed
    * last_seen + idleMs — emits one (user, last_seen) flag and drops
    * their state. Requires the RocksDB state store provider, like
    * [[runningCounts]].
    */
  def idleUsers(spark: SparkSession, events: DataFrame, tsCol: String,
                idleMs: Long, watermark: String): Dataset[IdleFlag] = {
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new IdleDetectProcessor(idleMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Per-user RUNNING event counts via `transformWithState` — the
    * arbitrary-stateful-processing v2 API (SPARK-46815, public in
    * Spark 4): typed state variables with per-state TTL, timers, and
    * initial-state support, superseding flatMapGroupsWithState's
    * single-blob state. Requires the RocksDB state store provider
    * (set `spark.sql.streaming.stateStore.providerClass` to
    * `...state.RocksDBStateStoreProvider` before starting the query —
    * the HDFS-backed default refuses TWS).
    *
    * Scale shape: state is one long per DISTINCT user — bounded by
    * key cardinality, not event volume; RocksDB spills it off-heap.
    */
  def runningCounts(spark: SparkSession,
                    events: DataFrame): Dataset[RunningCount] = {
    import spark.implicits._
    events.select(col("user_id").cast("long")).as[Long]
      .groupByKey(identity)
      .transformWithState(new RunningCountProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
