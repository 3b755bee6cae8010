package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Tables
import graft.queries.QueryDef

/** Event-time windowing over the `events` table.
  *
  * The window TRANSFORMS are defined once on a plain DataFrame and used
  * from two entry points:
  *  - batch (the oracle-checked queries below — `window()` /
  *    `session_window()` work identically on bounded frames);
  *  - Structured Streaming (`readStream` → same transform → `writeStream`
  *    with a watermark), exercised in the test suite via MemoryStream.
  * This is exactly Spark's unified-batch/stream contract, so the batch
  * oracle ALSO validates the streaming aggregation logic.
  */
object Events {

  // ---- transforms (shared batch/stream) ----

  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      // r12 sweep: integer cents inside the windowed aggregate (double
      // sums are accumulation-order-dependent; in streaming the order
      // additionally depends on micro-batch arrival).
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sum_cents"))
      .withColumn("sum_value", expr("CAST(sum_cents AS DOUBLE) / 100.0"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"), col("sum_value"))

  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      // r12 sweep: integer cents inside the windowed aggregate (double
      // sums are accumulation-order-dependent; in streaming the order
      // additionally depends on micro-batch arrival).
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sum_cents"))
      .withColumn("sum_value", expr("CAST(sum_cents AS DOUBLE) / 100.0"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"), col("sum_value"))

  def session(events: DataFrame, gap: String = "10 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      // r12 sweep: integer cents inside the windowed aggregate (double
      // sums are accumulation-order-dependent; in streaming the order
      // additionally depends on micro-batch arrival).
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sum_cents"))
      .withColumn("sum_value", expr("CAST(sum_cents AS DOUBLE) / 100.0"))
      .select(
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("s_start"),
        col("user_id"), col("n"), col("sum_value"))

  // ---- streaming entry points (tested with MemoryStream + file source) ----

  /** File-source streaming read of an events parquet directory — the
    * production readStream shape. A streaming source needs its schema
    * declared up front, but how this Spark surfaces the file's
    * TIMESTAMP(NANOS) column is version-dependent (≤4.0 + nanosAsLong →
    * LongType; 4.1+ → TimestampNTZType, nanos truncated to micros in the
    * reader). Declaring the wrong one silently yields corrupt rows, not an
    * analysis error — so probe the batch reader's resolved schema for the
    * same directory and mirror it, then normalize to TimestampType exactly
    * as Tables.events does. `maxFilesPerTrigger=1` gives deterministic
    * micro-batches in tests. */
  def readEventsStream(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Fallback ONLY for the empty/missing-path case (AnalysisException:
    // unable to infer schema / path not found) — a transient IO or
    // permission failure must SURFACE, because silently assuming the
    // 4.1+ schema on the wrong runtime yields corrupt rows, not an
    // analysis error (see doc note above).
    val tsType: DataType =
      try spark.read.parquet(dir).schema("ts").dataType
      catch {
        case _: org.apache.spark.sql.AnalysisException => TimestampNTZType
      }
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val raw = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    tsType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts read as unexpected type $other; update Events.readEventsStream")
    }
  }

  /** Streaming tumbling-window aggregation with late-data handling:
    * events later than the watermark are dropped, window state is evicted
    * once the watermark passes the window end. */
  def tumblingStream(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    tumbling(events.withWatermark("ts", watermark))

  /** Stream-stream interval join: each error event joined to same-user
    * click events from the preceding hour. Both sides carry watermarks
    * and the join condition bounds event-time distance, so Spark can
    * evict state once the watermark passes the interval — the only
    * state-bounded way to join two streams at 100 TB/day rates. */
  def clickErrorJoin(
      clicks: DataFrame, errors: DataFrame,
      watermark: String = "30 minutes",
      joinType: String = "inner",
      interval: String = "INTERVAL 1 HOUR"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_uid"), col("ts").as("click_ts"),
        col("value").as("click_value"))
    val e = errors.withWatermark("ts", watermark)
      .select(col("user_id").as("e_uid"), col("ts").as("error_ts"),
        col("event_id").as("error_id"))
    e.join(c,
      col("e_uid") === col("c_uid") &&
        col("click_ts") <= col("error_ts") &&
        col("click_ts") >= col("error_ts") - expr(interval),
      joinType)
      // coalesce carries the key for OUTER unmatched rows of either
      // side (for inner/left the e side is always present — unchanged)
      .select(coalesce(col("e_uid"), col("c_uid")).as("user_id"),
        col("error_id"), col("click_ts"), col("error_ts"),
        col("click_value"))
  }

  /** Streaming dedup within the watermark horizon. */
  def dedupStream(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  final case class RunningState(n: Long, sum: Double)
  final case class UserRunning(user_id: Long, n: Long, sum_value: Double)

  final case class SessionState(startMs: Long, endMs: Long, n: Long, sum: Double)
  final case class SessionOut(
      user_id: Long, start_ms: Long, end_ms: Long, n: Long, sum_value: Double)

  /** Custom sessionization via flatMapGroupsWithState with EVENT-TIME
    * timeout: a session closes (and is emitted, append-mode) only when
    * the watermark passes its gap horizon — the state store evicts
    * closed sessions, so state is bounded by the number of OPEN sessions
    * regardless of stream length (the 100 TB streaming invariant).
    * Input: (user_id, ts, value) rows already carrying a watermark. */
  def sessionizeStream(
      events: Dataset[(Long, java.sql.Timestamp, Double)],
      gap: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    // months have no fixed millisecond length — reject rather than
    // silently treating "1 month" as 0 ms.
    require(iv.months == 0, s"session gap must be day-scale or smaller: $gap")
    val gapMillis = iv.days * 86400000L + iv.microseconds / 1000L
    require(gapMillis > 0, s"session gap must be positive: $gap")

    events.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(uid, s.startMs, s.endMs, s.n, s.sum))
          } else {
            // Split the batch (merged with carried state) on event-time
            // gaps >= gapMillis — one micro-batch can span several
            // sessions (session_window semantics). All but the last
            // session are closed by construction and emit immediately;
            // the last stays in state under an event-time timeout.
            val evs = rows.toVector.sortBy(_._2.getTime)
            val segments = scala.collection.mutable.ArrayBuffer.empty[SessionState]
            var cur = state.getOption.orNull
            evs.foreach { case (_, ts, v) =>
              val t = ts.getTime
              if (cur == null) cur = SessionState(t, t, 1L, v)
              else if (t >= cur.endMs + gapMillis) {
                segments += cur
                cur = SessionState(t, t, 1L, v)
              } else cur = SessionState(math.min(cur.startMs, t),
                math.max(cur.endMs, t), cur.n + 1, cur.sum + v)
            }
            state.update(cur)
            state.setTimeoutTimestamp(cur.endMs + gapMillis)
            segments.iterator.map(s =>
              SessionOut(uid, s.startMs, s.endMs, s.n, s.sum))
          }
      }
  }

  /** Custom per-key running state via mapGroupsWithState (update mode):
    * the worked example of arbitrary stateful processing. */
  def runningTotals(events: Dataset[(Long, Double)]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[(Long, Double)], state: GroupState[RunningState]) =>
          val prev = state.getOption.getOrElse(RunningState(0L, 0.0))
          val (dn, ds) = rows.foldLeft((0L, 0.0)) {
            case ((n, sm), (_, v)) => (n + 1, sm + v)
          }
          val next = RunningState(prev.n + dn, prev.sum + ds)
          state.update(next)
          UserRunning(uid, next.n, next.sum)
      }
  }

  /** Per-key running (count, max) via `transformWithState` — Spark 4's
    * arbitrary-state v2 API, the successor to mapGroupsWithState used
    * by [[runningTotals]] above: state lives in NAMED typed slots on a
    * [[org.apache.spark.sql.streaming.StatefulProcessorHandle]] (a
    * processor can hold several value/list/map states), each slot can
    * carry its own TTL, timers are decoupled from the output mode, and
    * execution requires the RocksDB state store — the provider a
    * 100 TB deployment runs anyway (state scales with distinct keys,
    * not stream length, and spills off-heap). Kept alongside the v1
    * form so the engine demonstrates both extension points; the spec
    * drives this one under RocksDB and asserts the same running
    * semantics. */
  class RunningMaxProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Double), (Long, Long, Double)] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var state: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Double)](
        "agg", org.apache.spark.sql.Encoders.product[(Long, Double)],
        TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
      val (n0, m0) =
        if (state.exists()) state.get() else (0L, Double.MinValue)
      var n = n0; var m = m0
      rows.foreach { case (_, v) => n += 1; if (v > m) m = v }
      state.update((n, m))
      Iterator.single((key, n, m))
    }
  }

  /** st12 driver: the transformWithState running (count, max) per user
    * in update mode (one emitted row per touched key per micro-batch). */
  def runningMaxStream(
      events: Dataset[(Long, Double)]): Dataset[(Long, Long, Double)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new RunningMaxProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Per-user per-event-type running counts via a transformWithState
    * MAP state slot — the v2 state type the v1 API simply doesn't have:
    * under MapState, updating ONE event type's counter touches one
    * (user, type) entry in RocksDB, where mapGroupsWithState would
    * deserialize-update-reserialize the user's whole state blob per
    * batch. Every micro-batch re-emits the key's full (sorted) map, so
    * the sink always holds a consistent snapshot per touched user. */
  class TypeCountsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, String), (Long, String, Long)] {
    import org.apache.spark.sql.streaming.{MapState, TTLConfig, TimeMode, TimerValues}
    @transient private var counts: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "counts", org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
        timerValues: TimerValues): Iterator[(Long, String, Long)] = {
      rows.foreach { case (_, t) =>
        val prev = if (counts.containsKey(t)) counts.getValue(t) else 0L
        counts.updateValue(t, prev + 1)
      }
      counts.iterator().toSeq.sortBy(_._1)
        .map { case (t, c) => (key, t, c) }.iterator
    }
  }

  /** st13 driver: per-user event-type histogram maintained in MapState. */
  def typeCountsStream(
      events: Dataset[(Long, String)]): Dataset[(Long, String, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new TypeCountsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Inactivity-timeout session close via REGISTERED TIMERS — the v2
    * API extension point st12/st13 don't touch (r11 verdict ask #6):
    * a session closes when the event-time watermark passes
    * last-event + gap, which no per-input-row callback can observe —
    * the processor registers a timer at that instant and emits the
    * closed session from `handleExpiredTimer` when the watermark
    * crosses it. An event arriving ≥ gap after the current session's
    * end (possible before the watermark catches up) closes the old
    * session inline and starts a new one, so data-driven and
    * timer-driven closure agree on the [[sessionTimerBatch]] twin's
    * gaps-and-islands semantics (new session when ts − prev_ts ≥ gap,
    * st03's `session_window` merge rule).
    *
    * Timer hygiene: exactly ONE live timer per key — extending a
    * session deletes the stale timer (old end + gap) before
    * registering the new one; a fired timer is consumed by the engine.
    * State is one (start, end, n) triple per OPEN session — bounded by
    * live keys, evicted on close.
    *
    * Scale shape: one shuffle on user_id; state and timers both
    * O(open sessions), the 100 TB sessionization form. */
  class SessionTimerProcessor(gapUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, java.sql.Timestamp), (Long, Long, Long, Long)] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig, TimeMode, TimerValues, ValueState}
    // (start_us, end_us, n) of the key's open session
    @transient private var sess: ValueState[(Long, Long, Long)] = _
    private def usOf(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    private def gapMsCeil(endUs: Long): Long =
      // timers are millisecond-grain; round UP so the timer never
      // fires before the microsecond-exact gap has elapsed
      (endUs + gapUs + 999L) / 1000L
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[(Long, Long, Long)](
        "sess", org.apache.spark.sql.Encoders.product[(Long, Long, Long)],
        TTLConfig.NONE)
    override def handleInputRows(key: Long,
        rows: Iterator[(Long, java.sql.Timestamp)],
        timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
      val closed = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long)]
      // per-key micro-batch slice: bounded; sort for in-batch disorder
      val ts = rows.map(r => usOf(r._2)).toArray.sorted
      var cur = if (sess.exists()) Some(sess.get()) else None
      ts.foreach { t =>
        cur match {
          case Some((s0, e0, n0)) if t - e0 < gapUs =>
            cur = Some((s0, math.max(e0, t), n0 + 1))
          case Some((s0, e0, n0)) => // inline close: gap already elapsed
            closed += ((key, s0, e0, n0))
            getHandle.deleteTimer(gapMsCeil(e0))
            cur = Some((t, t, 1L))
          case None =>
            cur = Some((t, t, 1L))
        }
      }
      cur.foreach { case (s0, e0, n0) =>
        if (sess.exists()) {
          val (_, oldEnd, _) = sess.get()
          if (gapMsCeil(oldEnd) != gapMsCeil(e0))
            getHandle.deleteTimer(gapMsCeil(oldEnd))
        }
        sess.update((s0, e0, n0))
        getHandle.registerTimer(gapMsCeil(e0))
      }
      closed.iterator
    }
    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long)] =
      if (sess.exists()) {
        val (s0, e0, n0) = sess.get()
        // a stale timer (session extended since registration) must not
        // close the live session — only the timer at end+gap counts
        if (expiredTimerInfo.getExpiryTimeInMs() >= gapMsCeil(e0)) {
          sess.clear()
          Iterator.single((key, s0, e0, n0))
        } else Iterator.empty
      } else Iterator.empty
  }

  /** st23 stream driver: timer-closed sessions in append mode (a row
    * is emitted exactly once, when its session closes — by timeout or
    * by a same-key successor arriving past the gap). */
  def sessionTimerStream(events: Dataset[(Long, java.sql.Timestamp)],
      gap: String = "30 minutes",
      watermark: String = "0 seconds"): Dataset[(Long, Long, Long, Long)] = {
    import events.sparkSession.implicits._
    val gapUs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String
        .fromString(gap)).microseconds match {
      case us if us > 0 => us
      case _ => 30L * 60 * 1000000
    }
    events.toDF("user_id", "ts")
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new SessionTimerProcessor(gapUs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Per-key running count whose ValueState carries a TTL — the OTHER
    * v2-API extension point next to [[SessionTimerProcessor]]'s timers
    * (r11 verdict ask #6): `TTLConfig(Duration)` puts an expiry clock
    * (processing time, by API contract) on ONE named state slot, so an
    * idle key's state is reclaimed without any timer bookkeeping — the
    * cache-eviction shape for per-key enrichment state at 100 TB
    * (state ∝ RECENTLY ACTIVE keys, not keys ever seen). The emitted
    * `had_state` flag makes expiry observable: a key touched after its
    * TTL reads as absent and restarts at 1. */
  class TtlRunningCountProcessor(ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Double), (Long, Long, Boolean)] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var cnt: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cnt = getHandle.getValueState[Long](
        "cnt", org.apache.spark.sql.Encoders.scalaLong,
        TTLConfig(java.time.Duration.ofMillis(ttlMs)))
    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[(Long, Long, Boolean)] = {
      val had = cnt.exists()
      val n = (if (had) cnt.get() else 0L) + rows.size
      cnt.update(n)
      Iterator.single((key, n, had))
    }
  }

  /** TTL driver: processing-time state expiry needs TimeMode
    * ProcessingTime. */
  def ttlRunningCountStream(events: Dataset[(Long, Double)],
      ttlMs: Long): Dataset[(Long, Long, Boolean)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new TtlRunningCountProcessor(ttlMs),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Update())
  }

  /** The batch twin of [[sessionTimerStream]]: gaps-and-islands with
    * the processor's exact rule (new session when ts − prev ≥ gap) at
    * microsecond precision — what the stream converges to once the
    * watermark passes every end + gap. */
  def sessionTimerBatch(events: DataFrame, gapUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
    events
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_s",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) >= gapUs, 1L).otherwise(0L))
      .withColumn("session_no", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_no")
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
        count(lit(1)).as("n_events"))
  }

  // ---- oracle-checked batch queries ----

  /** st01 — tumbling 1h windows. Spark window starts are epoch-aligned,
    * so DuckDB's date_trunc('hour') mirrors them exactly. */
  val tumblingQ: QueryDef = QueryDef(
    "st01_window_tumbling",
    (s, d) => tumbling(Tables.events(s, d)).orderBy("w_start", "event_type"),
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
            event_type, count(*) AS n,
              CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                / 100.0 AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY w_start, event_type"""))

  /** st02 — sliding 1h/30m windows: each event belongs to 2 windows; the
    * oracle unnests the two candidate starts. */
  val slidingQ: QueryDef = QueryDef(
    "st02_window_sliding",
    (s, d) => sliding(Tables.events(s, d)).orderBy("w_start", "event_type"),
    Some("""WITH w AS (
              SELECT event_type, value,
                unnest([to_timestamp(floor(epoch(ts) / 1800) * 1800),
                        to_timestamp(floor(epoch(ts) / 1800) * 1800
                                     - 1800)]) AS w_start
              FROM events)
            SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start, event_type,
              count(*) AS n,
              CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                / 100.0 AS sum_value
            FROM w GROUP BY 1, 2 ORDER BY w_start, event_type"""))

  /** st03 — session windows (10-minute gap) per user; the oracle uses the
    * classic gaps-and-islands rewrite (new session when the gap from the
    * previous event is >= the timeout, matching session_window's
    * half-open [ts, ts+gap) merge rule). */
  val sessionQ: QueryDef = QueryDef(
    "st03_window_session",
    (s, d) => session(Tables.events(s, d)).orderBy("user_id", "s_start"),
    Some("""WITH x AS (
              SELECT user_id, ts, value,
                CASE WHEN ts >= lag(ts) OVER w + INTERVAL 10 MINUTE
                       OR lag(ts) OVER w IS NULL
                     THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            g AS (
              SELECT user_id, ts, value,
                sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
              FROM x)
            SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start, user_id,
              count(*) AS n,
              CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                / 100.0 AS sum_value
            FROM g GROUP BY user_id, sid ORDER BY user_id, s_start"""))

  /** st04 — per-window distinct-user cardinality: exact here (oracle
    * parity); the streaming/100 TB form swaps countDistinct for
    * approx_count_distinct (sketch state merges across triggers). */
  val windowDistinctQ: QueryDef = QueryDef(
    "st04_window_distinct",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("event_type")).as("n_types"),
          count(lit(1)).as("n"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
          col("n_users"), col("n_types"), col("n"))
        .orderBy("w_start"),
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
            count(DISTINCT user_id) AS n_users,
            count(DISTINCT event_type) AS n_types, count(*) AS n
            FROM events GROUP BY 1 ORDER BY w_start"""))

  /** st05 — the stream-stream interval join ([[clickErrorJoin]]) run in
    * batch mode over the events table and oracle-checked: same library
    * code, same join predicate (user equi-key + 1-hour lookback band),
    * mirrored as a DuckDB interval self-join. In streaming mode the
    * watermark bounds each side's buffered state to the hour band; here
    * the watermark is a no-op and the plan is the q10-style range join
    * shuffling on the user-key equi conjunct. click_value passes through
    * unrounded — both engines read the identical parquet doubles. */
  val intervalJoinQ: QueryDef = QueryDef(
    "st05_stream_interval_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      clickErrorJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "error"))
        .select(col("user_id"), col("error_id"),
          date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          date_format(col("error_ts"), "yyyy-MM-dd HH:mm:ss").as("error_ts"),
          col("click_value"))
        .orderBy("error_id", "click_ts", "click_value")
    },
    Some("""SELECT c.user_id, e.event_id AS error_id,
            strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
            strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
            c.value AS click_value
            FROM events e JOIN events c
              ON c.event_type = 'click' AND e.event_type = 'error'
              AND c.user_id = e.user_id
              AND c.ts <= e.ts AND c.ts >= e.ts - INTERVAL 1 HOUR
            ORDER BY error_id, click_ts, click_value"""))

  /** Stream-static enrichment join: the event stream joined to bounded
    * dimension tables (customer → nation), then aggregated per
    * (nation, event_type). The dims are `broadcast()` — a stream-static
    * join never shuffles the stream side and re-reads the static side per
    * micro-batch, which is THE pattern for enriching a 100 TB/day stream
    * with reference data. The value sum goes through exact integer cents
    * (`value` is 2-decimal by contract) so the result is independent of
    * double accumulation order — portable across engines AND across
    * micro-batch boundaries (a plain double sum could differ between the
    * streaming and batch runs of the same data). */
  def enrich(events: DataFrame, customers: DataFrame,
      nations: DataFrame): DataFrame =
    events
      .join(broadcast(customers.select(col("c_custkey"), col("c_nationkey"))),
        col("user_id") === col("c_custkey"))
      .join(broadcast(nations.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "event_type")
      .agg(count(lit(1)).as("n"),
        (sum(expr("CAST(round(value * 100) AS BIGINT)")) / 100.0)
          .as("sum_value"))

  /** Batch dedup with SURVIVOR-ROW semantics: for each event_id, the
    * earliest-ts row (min user_id among exact-ts ties — a total,
    * deterministic rule, unlike min_by whose tie-break is arbitrary on
    * both engines). Two phases, both scale-shaped: a hash agg for the
    * min ts per key, then an equi-join back restricted to that ts.
    * Unlike independent min(ts)+min(user_id) aggregates, the output
    * (ts, user_id) pair is always a row that actually existed. */
  def dedupBatch(events: DataFrame): DataFrame = {
    val firsts = events.groupBy(col("event_id").as("e_id"))
      .agg(min(col("ts")).as("first_ts"), count(lit(1)).as("n_copies"))
    events
      .join(firsts,
        col("event_id") === col("e_id") && col("ts") === col("first_ts"))
      .groupBy("event_id")
      .agg(
        date_format(first(col("first_ts")), "yyyy-MM-dd HH:mm:ss")
          .as("first_ts"),
        min(col("user_id")).as("user_id"),
        first(col("n_copies")).as("n_copies"))
  }

  /** st11 — the LEFT-OUTER stream-stream join's batch twin: st05's
    * interval join with unmatched errors RETAINED (null click columns) —
    * the "error with no click in the preceding hour" alerting shape. In
    * streaming mode the outer side can only emit once the watermark
    * closes the band (the StreamingSpec left-outer test drives exactly
    * that); in batch the watermark is a no-op and the plan is the same
    * q10-style range join, now left_outer. A `matched` flag renders the
    * null-ness as a typed column; null click fields stay null through
    * date_format on both engines. */
  val streamLeftJoinQ: QueryDef = QueryDef(
    "st11_stream_left_outer_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      clickErrorJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "error"),
        joinType = "left_outer")
        .select(col("user_id"), col("error_id"),
          date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          date_format(col("error_ts"), "yyyy-MM-dd HH:mm:ss").as("error_ts"),
          col("click_value"),
          col("click_ts").isNotNull.as("matched"))
        .orderBy("error_id", "click_ts", "click_value")
    },
    Some("""SELECT e.user_id, e.event_id AS error_id,
            strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
            strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
            c.value AS click_value,
            c.ts IS NOT NULL AS matched
            FROM (SELECT * FROM events WHERE event_type = 'error') e
            LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON c.user_id = e.user_id
              AND c.ts <= e.ts AND c.ts >= e.ts - INTERVAL 1 HOUR
            ORDER BY error_id, click_ts, click_value"""))

  /** st06 — watermark dedup's batch twin: one survivor row per event_id
    * ([[dedupBatch]]), the steady state [[dedupStream]]
    * (dropDuplicatesWithinWatermark) converges to once the watermark
    * passes — with the survivor pinned to earliest-ts/min-user rather
    * than dropDuplicates' arbitrary first-seen row, so the result is
    * deterministic and oracle-checkable. Planted-duplicate semantics are
    * spec-tested (the fixture itself has unique event_ids). */
  val dedupBatchQ: QueryDef = QueryDef(
    "st06_dedup_by_event_id",
    (s, d) => dedupBatch(Tables.events(s, d)).orderBy("event_id"),
    Some("""WITH firsts AS (
              SELECT event_id AS e_id, min(ts) AS first_ts,
                count(*) AS n_copies
              FROM events GROUP BY 1)
            SELECT event_id,
              strftime(min(f.first_ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
              min(user_id) AS user_id, min(f.n_copies) AS n_copies
            FROM events e JOIN firsts f
              ON e.event_id = f.e_id AND e.ts = f.first_ts
            GROUP BY event_id ORDER BY event_id"""))

  /** st07 — [[enrich]]'s batch twin, oracle-checked: same library code,
    * same broadcast-dim plan (the streaming run in StreamingSpec asserts
    * result equality with this batch form). Integer-cents summation makes
    * the double output exact, so no rounding tolerance is involved. */
  val enrichQ: QueryDef = QueryDef(
    "st07_stream_static_enrich",
    (s, d) =>
      enrich(Tables.events(s, d), Tables.customer(s, d), Tables.nation(s, d))
        .orderBy("n_name", "event_type"),
    Some("""SELECT n_name, event_type, count(*) AS n,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0
              AS sum_value
            FROM events e
            JOIN customer c ON e.user_id = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Exactly-once file sink for foreachBatch (the standard Structured
    * Streaming idempotent-replay pattern): each micro-batch lands in its
    * own `batch_id=N` partition directory with dynamic partition
    * OVERWRITE, so a replayed batch — Spark re-delivers the SAME batchId
    * after a failure — rewrites its own partition instead of appending
    * duplicates. Readers see `basePath/batch_id=*` as one table; end-to-
    * end semantics upgrade from at-least-once to exactly-once with no
    * transaction log, on any filesystem with atomic directory rename.
    *
    * Usage: `ds.writeStream.foreachBatch(idempotentBatchWriter(dir) _)`.
    * Factored as a plain (DataFrame, Long) function so the replay path
    * is directly testable without a harness failure injection. */
  def idempotentBatchWriter(baseDir: String)(batch: DataFrame, batchId: Long): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      // per-write option, not session conf: only the partitions present
      // in THIS batch are replaced; other batches' directories survive
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(baseDir)

  /** st08 — per-window KMV distinct-user estimate, side by side with the
    * exact count: st04's 100 TB form made ORACLE-EXACT. Where st04's
    * `countDistinct` shuffles every (window, user) pair, the sketch
    * keeps only the k smallest portable md5 hashes PER WINDOW — the
    * rank-limit window gets Spark 4's WindowGroupLimit map-side prune,
    * so each map task forwards ≤k hash rows per window, the same
    * bounded-state shape a streaming trigger would keep. Estimate
    * arithmetic is e05's: (k−1)·2⁶⁰/h₍ₖ₎ above k, exact below — both
    * engines bit-identical. k=8 keeps both code paths exercised on the
    * fixture (≈38% σ at k=8; production would use k=256+). */
  val windowSketchQ: QueryDef = {
    val K = 8
    QueryDef(
      "st08_window_kmv_distinct",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
        val h = ev.select(
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
              .as("w_start"),
            expr(graft.ext.Dedup.sparkMd5Int60("CAST(user_id AS STRING)")).as("h"))
          .distinct()
        val kmin = h
          .withColumn("rn", row_number().over(
            Window.partitionBy("w_start").orderBy("h")))
          .filter(col("rn") <= K)
          .groupBy("w_start")
          .agg(count(lit(1)).as("m"), max("h").as("hk"))
          .select(col("w_start"),
            when(col("m") < K, col("m").cast("double"))
              .otherwise(expr(
                s"${K - 1}e0 * CAST(1152921504606846976 AS DOUBLE) / CAST(hk AS DOUBLE)"))
              .as("kmv_users"))
        val exact = ev.groupBy(
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
              .as("w_start"))
          .agg(countDistinct(col("user_id")).as("exact_users"))
        kmin.join(exact, "w_start").orderBy("w_start")
      },
      Some(s"""WITH h AS (
                 SELECT DISTINCT strftime(date_trunc('hour', ts),
                          '%Y-%m-%d %H:%M:%S') AS w_start,
                   ${graft.ext.Dedup.duckMd5Int60("CAST(user_id AS VARCHAR)")} AS h
                 FROM events),
               r AS (
                 SELECT w_start, h,
                   row_number() OVER (PARTITION BY w_start ORDER BY h) AS rn
                 FROM h),
               k AS (
                 SELECT w_start, count(*) AS m, max(h) AS hk
                 FROM r WHERE rn <= $K GROUP BY 1),
               e AS (
                 SELECT strftime(date_trunc('hour', ts),
                          '%Y-%m-%d %H:%M:%S') AS w_start,
                   count(DISTINCT user_id) AS exact_users
                 FROM events GROUP BY 1)
               SELECT k.w_start,
                 CASE WHEN m < $K THEN CAST(m AS DOUBLE)
                      ELSE ${K - 1}e0 * CAST(1152921504606846976 AS DOUBLE)
                           / CAST(hk AS DOUBLE) END AS kmv_users,
                 exact_users
               FROM k JOIN e USING (w_start) ORDER BY w_start"""))
  }

  /** st09 — ordered funnel analysis (view → click → purchase): how many
    * users complete each step IN ORDER, where step k counts only events
    * at-or-after the user's step-(k−1) completion time. The standard
    * product-analytics funnel, computed in k user-keyed phases: each
    * step is one conditional min aggregate plus one equi join-back on
    * the user key — never a per-user sort or collect. All comparisons
    * are on exact integer microsecond timestamps — oracle-exact. */
  def funnelOf(ev: DataFrame): DataFrame = {
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = ev.join(s1, "user_id")
      .filter(col("event_type") === "click" && col("ts") >= col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = ev.join(s2, "user_id")
      .filter(col("event_type") === "purchase" && col("ts") >= col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    s1.agg(count(lit(1)).as("n_view")).crossJoin(
        s2.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(s3.agg(count(lit(1)).as("n_view_click_purchase")))
  }

  val funnelQ: QueryDef = QueryDef(
    "st09_funnel_steps",
    (s, d) => funnelOf(
      Tables.events(s, d).select("user_id", "event_type", "ts")),
    Some("""WITH s1 AS (
              SELECT user_id, min(ts) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY 1),
            s2 AS (
              SELECT e.user_id, min(ts) AS t2
              FROM events e JOIN s1 USING (user_id)
              WHERE event_type = 'click' AND ts >= t1 GROUP BY 1),
            s3 AS (
              SELECT e.user_id, min(ts) AS t3
              FROM events e JOIN s2 USING (user_id)
              WHERE event_type = 'purchase' AND ts >= t2 GROUP BY 1)
            SELECT (SELECT count(*) FROM s1) AS n_view,
                   (SELECT count(*) FROM s2) AS n_view_click,
                   (SELECT count(*) FROM s3) AS n_view_click_purchase"""))

  /** st10 — cohort retention: of the users active in hour H, how many
    * are also active in hour H+1 / H+24. One distinct (user, hour)
    * reduction (activity matrix — user-hour-sized, much smaller than the
    * event log), then self-equi-joins shifted by the lag; counts are
    * integers — oracle-exact. The classic DAU-retention triangle at
    * hourly grain. */
  val retentionQ: QueryDef = QueryDef(
    "st10_cohort_retention",
    (s, d) => {
      val act = Tables.events(s, d)
        .select(col("user_id"),
          (unix_timestamp(date_trunc("hour", col("ts"))) / 3600)
            .cast("long").as("h"))
        .distinct()
      val nxt = act.select(col("user_id"), (col("h") - 1).as("h"))
        .distinct().withColumnRenamed("user_id", "u1")
      val day = act.select(col("user_id"), (col("h") - 24).as("h"))
        .distinct().withColumnRenamed("user_id", "u24")
      act
        .join(nxt, act("user_id") === nxt("u1") && act("h") === nxt("h"), "left")
        .join(day, act("user_id") === day("u24") && act("h") === day("h"), "left")
        .groupBy(act("h"))
        .agg(count(lit(1)).as("n_active"),
          count(col("u1")).as("n_retained_1h"),
          count(col("u24")).as("n_retained_24h"))
        .select(
          from_unixtime(col("h") * 3600, "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("n_active"), col("n_retained_1h"), col("n_retained_24h"))
        .orderBy("hour")
    },
    Some("""WITH act AS (
              SELECT DISTINCT user_id,
                CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS h
              FROM events)
            SELECT strftime(to_timestamp(a.h * 3600), '%Y-%m-%d %H:%M:%S')
                     AS hour,
              count(*) AS n_active,
              CAST(sum(CASE WHEN n1.user_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_retained_1h,
              CAST(sum(CASE WHEN n24.user_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_retained_24h
            FROM act a
            LEFT JOIN act n1 ON n1.user_id = a.user_id AND n1.h = a.h + 1
            LEFT JOIN act n24 ON n24.user_id = a.user_id AND n24.h = a.h + 24
            GROUP BY 1 ORDER BY hour"""))

  /** st15 — the FULL-OUTER stream-stream join's batch twin: st11 with
    * BOTH unmatched sides retained — errors with no preceding-hour
    * click AND clicks that preceded no error (the reconciliation shape:
    * neither side may be dropped when auditing event completeness). In
    * streaming mode each side's unmatched rows emit once ITS watermark
    * closes the interval (Spark supports full-outer stream-stream joins
    * with watermarks + a time-range condition since 3.1); in batch the
    * plan is the same range join, `full_outer`. A `side` column types
    * the three match states. */
  val streamFullJoinQ: QueryDef = QueryDef(
    "st15_stream_full_outer_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      clickErrorJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "error"),
        joinType = "full_outer")
        .select(col("user_id"), col("error_id"),
          date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          date_format(col("error_ts"), "yyyy-MM-dd HH:mm:ss").as("error_ts"),
          col("click_value"),
          when(col("error_id").isNull, lit("click_only"))
            .when(col("click_ts").isNull, lit("error_only"))
            .otherwise(lit("both")).as("side"))
        .orderBy("user_id", "side", "error_id", "click_ts", "click_value")
    },
    Some("""SELECT coalesce(e.user_id, c.user_id) AS user_id,
            e.event_id AS error_id,
            strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
            strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
            c.value AS click_value,
            CASE WHEN e.event_id IS NULL THEN 'click_only'
                 WHEN c.ts IS NULL THEN 'error_only'
                 ELSE 'both' END AS side
            FROM (SELECT * FROM events WHERE event_type = 'error') e
            FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON c.user_id = e.user_id
              AND c.ts <= e.ts AND c.ts >= e.ts - INTERVAL 1 HOUR
            ORDER BY user_id, side, error_id, click_ts, click_value"""))

  /** Per-window event-type counts — the streaming-aggregation stage of
    * st14. Ranking happens downstream (per completed window, a bounded
    * ≤|event_type-domain| relation), because a rank inside a streaming
    * agg would re-order on every update; the counts stream is what the
    * state store holds. One definition shared stream/batch. */
  def typeCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"))

  /** Streaming form: watermarked counts, state evicted per closed window. */
  def typeCountsStream(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    typeCounts(events.withWatermark("ts", watermark))

  /** st14 — per-window top-k event types ("trending types"): hourly
    * windows, top-3 types by count with a total (n DESC, event_type)
    * ranking — the leaderboard every event pipeline keeps per window.
    * Batch form registered + oracle-exact; the streaming form runs
    * [[typeCountsStream]] into the state store and ranks each CLOSED
    * window downstream (StreamingSpec asserts stream counts == batch
    * counts on the real file source).
    *
    * Scale shape: one (window, type)-keyed streaming-friendly agg —
    * state rows bounded by windows × type-domain — then a rank window
    * partitioned by w_start over that already-aggregated relation. */
  val topTypesQ: QueryDef = QueryDef(
    "st14_window_top_types",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      typeCounts(Tables.events(s, d))
        .withColumn("rank", row_number().over(
          Window.partitionBy("w_start")
            .orderBy(col("n").desc, col("event_type"))))
        .filter(col("rank") <= 3)
        .orderBy("w_start", "rank")
    },
    Some("""WITH c AS (
              SELECT strftime(date_trunc('hour', ts),
                       '%Y-%m-%d %H:%M:%S') AS w_start,
                event_type, count(*) AS n
              FROM events GROUP BY 1, 2),
            r AS (
              SELECT w_start, event_type, n,
                CAST(row_number() OVER (PARTITION BY w_start
                     ORDER BY n DESC, event_type) AS INTEGER) AS rank
              FROM c)
            SELECT w_start, event_type, n, rank FROM r
            WHERE rank <= 3 ORDER BY w_start, rank"""))

  /** st12b — the [[RunningMaxProcessor]]'s batch twin: the SAME
    * transformWithState processor run over the bounded events table
    * (Spark executes stateful processors on batch input by feeding each
    * key's rows through one `handleInputRows` call against empty state),
    * so the final emitted row per key IS the stream's steady state:
    * per-user (count, max value) ≡ one GROUP BY. The MemoryStream spec
    * remains the streaming-side proof (incremental updates); this row
    * gives the processor an oracle-backed CORRECTNESS entry. max(value)
    * involves no arithmetic — both engines compare identical parquet
    * doubles — so it passes unrounded like st05's click_value. */
  /** transformWithState (batch or stream) requires the RocksDB state
    * store provider; the batch twins set it for the plan's execution and
    * restore the previous value so the shared Verify/Bench session is
    * not left reconfigured (the q53 save/restore discipline). The conf
    * is read at execution, so it must wrap the ACTION — the twins
    * eagerly materialize via localCheckpoint inside the wrapper. */
  private def withRocksDb[A](s: SparkSession)(body: => A): A = {
    // Batch TransformWithStateExec builds its StateStoreConf from a
    // FRESH default SQLConf (only the provider key is overridden), so
    // session-level confs cannot reach it — in particular snapshot-lag
    // reporting stays on and phones the StateStoreCoordinator RPC
    // endpoint. That endpoint is registered by StreamingQueryManager's
    // constructor, which a pure-batch session never builds; touching
    // `streams` forces it so the executor-side lookup succeeds.
    s.streams
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  val runningMaxBatchQ: QueryDef = QueryDef(
    "st12b_running_max_batch",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("value")).as[(Long, Double)]
      withRocksDb(s) {
        runningMaxStream(ev).toDF("user_id", "n", "max_value")
          .localCheckpoint()
      }.orderBy("user_id")
    },
    Some("""SELECT user_id, count(*) AS n, max(value) AS max_value
            FROM events GROUP BY user_id ORDER BY user_id"""))

  /** st13b — the [[TypeCountsProcessor]]'s batch twin: MapState per-user
    * event-type histogram over bounded input ≡ GROUP BY (user, type).
    * One batch means one `handleInputRows` per key, which re-emits the
    * key's full sorted map — exactly the histogram. */
  val typeCountsBatchQ: QueryDef = QueryDef(
    "st13b_type_counts_batch",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type")).as[(Long, String)]
      withRocksDb(s) {
        typeCountsStream(ev).toDF("user_id", "event_type", "n")
          .localCheckpoint()
      }.orderBy("user_id", "event_type")
    },
    Some("""SELECT user_id, event_type, count(*) AS n
            FROM events GROUP BY user_id, event_type
            ORDER BY user_id, event_type"""))

  /** st16 — windowed rate-anomaly detection: hourly per-type counts
    * (the SAME [[typeCounts]] stage st14 streams through the state
    * store), each window flagged against its type's own count
    * distribution — the traffic-spike / outage alarm every event
    * pipeline runs on its windowed aggregates.
    *
    * Determinism: the 2σ population test |c − μ| > 2σ is cleared of
    * division and square roots by cross-multiplying into exact longs:
    * with W windows, S = Σc, Q = Σc², flag iff
    * (W·c − S)² > 4·(W·Q − S²). Bound: W·c must stay under ~3·10⁹ for
    * the square to fit a long — at 10⁹-events/hour/type scale, widen
    * to DECIMAL(38,0) accumulators exactly as x36's checksum documents.
    *
    * Scale shape: the counts stage is the streaming-friendly
    * (window, type) agg (state rows bounded by windows × type-domain);
    * the per-type moment stats aggregate a windows-sized relation and
    * broadcast back onto it (type domain is bounded). Streaming form:
    * [[typeCountsStream]] emits closed windows; the scoring join runs
    * downstream against trailing per-type stats — StreamingSpec's
    * st14 stream==batch proof covers the shared stage. */
  val windowAnomalyQ: QueryDef = QueryDef(
    "st16_window_anomaly",
    (s, d) => {
      val counts = typeCounts(Tables.events(s, d))
      val stats = counts.groupBy("event_type")
        .agg(count(lit(1)).as("n_windows"),
          sum(col("n")).as("sum_n"),
          sum(expr("n * n")).as("sum_n2"))
      counts.join(broadcast(stats), Seq("event_type"))
        .withColumn("dev_scaled", expr("n_windows * n - sum_n"))
        .withColumn("is_anomaly", expr(
          "dev_scaled * dev_scaled > 4 * (n_windows * sum_n2 - sum_n * sum_n)"))
        .select("w_start", "event_type", "n", "n_windows", "sum_n",
          "dev_scaled", "is_anomaly")
        .orderBy("event_type", "w_start")
    },
    Some("""WITH c AS (
              SELECT strftime(date_trunc('hour', ts),
                       '%Y-%m-%d %H:%M:%S') AS w_start,
                event_type, count(*) AS n
              FROM events GROUP BY 1, 2),
            stats AS (
              SELECT event_type, count(*) AS n_windows,
                sum(n) AS sum_n, sum(n * n) AS sum_n2
              FROM c GROUP BY 1)
            SELECT w_start, c.event_type, n,
              CAST(n_windows AS BIGINT) AS n_windows,
              CAST(sum_n AS BIGINT) AS sum_n,
              CAST(n_windows * n - sum_n AS BIGINT) AS dev_scaled,
              CAST(n_windows * n - sum_n AS BIGINT)
                * CAST(n_windows * n - sum_n AS BIGINT)
                > 4 * CAST(n_windows * sum_n2 - sum_n * sum_n AS BIGINT)
                AS is_anomaly
            FROM c JOIN stats USING (event_type)
            ORDER BY event_type, w_start"""))

  /** Stream-stream LEFT SEMI interval join: errors that HAD a same-user
    * click in the preceding hour — the correlation-FILTER form of
    * st05's enumeration join (alert only when a correlated event
    * exists; each error emits AT MOST ONCE however many clicks match,
    * which is the semantic difference from inner). Both sides carry
    * watermarks and the predicate bounds event-time distance, so state
    * evicts exactly as in st05.
    *
    * State note (REVISED by the r11 StateSizeAudit, which measured the
    * engine rather than assuming): state ROW counts equal st05's — the
    * symmetric hash join stores both sides until watermark eviction in
    * every mode, flagging (not dropping) a semi-matched error. What
    * the semi form saves at scale is state BYTES (the click side
    * carries no enumeration payload columns) and OUTPUT cardinality
    * (at most one row per error, no click multiplication) — see
    * STATE_SIZE.json. */
  def errorWithClickSemi(
      clicks: DataFrame, errors: DataFrame,
      watermark: String = "30 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_uid"), col("ts").as("click_ts"))
    val e = errors.withWatermark("ts", watermark)
      .select(col("user_id").as("e_uid"), col("ts").as("error_ts"),
        col("event_id").as("error_id"))
    e.join(c,
      col("e_uid") === col("c_uid") &&
        col("click_ts") <= col("error_ts") &&
        col("click_ts") >= col("error_ts") - expr("INTERVAL 1 HOUR"),
      "left_semi")
      .select(col("e_uid").as("user_id"), col("error_id"), col("error_ts"))
  }

  /** st17 — the batch form of [[errorWithClickSemi]] (StreamingSpec
    * proves stream==batch on MemoryStream input; the DuckDB mirror is
    * the EXISTS correlation filter). Scale shape: same equi shuffle on
    * user_id as st05 with a time-range residual; at 100 TB the semi
    * form is the one to prefer for alerting — no row multiplication,
    * state bounded by the interval. */
  val streamSemiJoinQ: QueryDef = QueryDef(
    "st17_stream_semi_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      errorWithClickSemi(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "error"))
        .select(col("user_id"), col("error_id"),
          date_format(col("error_ts"), "yyyy-MM-dd HH:mm:ss").as("error_ts"))
        .orderBy("error_id")
    },
    Some("""SELECT e.user_id, e.event_id AS error_id,
            strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS error_ts
            FROM events e
            WHERE e.event_type = 'error' AND EXISTS (
              SELECT 1 FROM events c
              WHERE c.event_type = 'click' AND c.user_id = e.user_id
                AND c.ts <= e.ts AND c.ts >= e.ts - INTERVAL 1 HOUR)
            ORDER BY error_id"""))

  /** Streaming CEP alarm: errors preceded by ≥ `minClicks` same-user
    * clicks within 24 hours — the thresholded-correlation sequence
    * pattern (burst-then-failure), one step up from st17's EXISTS.
    * CHAINED STATEFUL operators in one query (SPARK-42376): the
    * watermarked interval join enumerates (error, click) matches, then
    * a windowed count over the join output aggregates them — the
    * tumbling window over error_ts gives the aggregation its
    * event-time eviction horizon, and is dropped from the output (each
    * error lives in exactly one window, so it adds no grouping
    * information — it exists purely to make append-mode emission
    * watermark-driven). Both states evict on the same watermark.
    *
    * Scale shape: one user-keyed interval equi-join + one
    * (error)-keyed hash agg; every key contains user/error ids, so
    * corpus growth adds reducers. */
  def cepAlarmStream(clicks: DataFrame, errors: DataFrame,
      watermark: String = "30 minutes", minClicks: Int = 2): DataFrame =
    clickErrorJoin(clicks, errors, watermark,
      interval = "INTERVAL 24 HOURS")
      .groupBy(window(col("error_ts"), "1 hour"), col("user_id"),
        col("error_id"))
      // error_ts is functionally determined by error_id; aggregating it
      // (instead of grouping by it) keeps exactly ONE event-time column
      // in the aggregate keys — the engine rejects two (window + raw ts)
      .agg(count(lit(1)).as("n_clicks"), max("error_ts").as("error_ts"))
      .filter(col("n_clicks") >= minClicks)
      .select("user_id", "error_id", "error_ts", "n_clicks")

  /** st21 — the batch form of [[cepAlarmStream]] (StreamingSpec proves
    * stream==batch): same join + count, no eviction window needed.
    * The DuckDB mirror is the correlated interval join with HAVING. */
  val cepAlarmQ: QueryDef = QueryDef(
    "st21_cep_alarm",
    (s, d) => {
      val ev = Tables.events(s, d)
      clickErrorJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "error"),
        interval = "INTERVAL 24 HOURS")
        .groupBy("user_id", "error_id")
        .agg(count(lit(1)).as("n_clicks"), max("error_ts").as("error_ts"))
        .filter(col("n_clicks") >= 2)
        .select(col("user_id"), col("error_id"),
          date_format(col("error_ts"), "yyyy-MM-dd HH:mm:ss").as("error_ts"),
          col("n_clicks"))
        .orderBy("error_id")
    },
    Some("""SELECT e.user_id, e.event_id AS error_id,
            strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
            CAST(count(*) AS BIGINT) AS n_clicks
            FROM events e
            JOIN events c ON c.event_type = 'click'
              AND c.user_id = e.user_id
              AND c.ts <= e.ts AND c.ts >= e.ts - INTERVAL 24 HOUR
            WHERE e.event_type = 'error'
            GROUP BY 1, 2, 3
            HAVING count(*) >= 2
            ORDER BY error_id"""))

  /** Two-level windowed rollup stage: 5-minute tumbling per-type counts
    * re-windowed into hourly summaries (total events, peak 5-minute
    * burst, live-bucket count). The second `groupBy` windows over
    * `window_time` of the FIRST window's column — Spark's chained
    * event-time window aggregation (SPARK-40821), which keeps BOTH
    * aggregations stateful inside one streaming query: the fine
    * windows evict on the watermark and the hourly rollup consumes
    * their closed results, so state is (5-min buckets in flight) +
    * (hours in flight), never raw events twice. This is the standard
    * dashboard shape — minute-grain for burst detection, hour-grain
    * for capacity — computed in ONE pass instead of two jobs re-reading
    * the stream. */
  def typeRollup(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(window(window_time(col("window")), "1 hour"),
        col("event_type"))
      .agg(sum(col("n")).as("n_events"), max(col("n")).as("peak_bucket"),
        count(lit(1)).as("n_buckets"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n_events"), col("peak_bucket"),
        col("n_buckets"))

  /** Streaming form: one watermark drives both window levels. */
  def typeRollupStream(events: DataFrame,
      watermark: String = "30 minutes"): DataFrame =
    typeRollup(events.withWatermark("ts", watermark))

  /** st18 — the batch form of [[typeRollupStream]] (StreamingSpec proves
    * stream==batch on MemoryStream input). Scale shape: the 5-minute
    * agg is the only pass over raw events (map-side partial on
    * (bucket, type)); the hourly rollup aggregates a frame already
    * 300× smaller. Exact longs end to end — nothing floats. */
  val windowRollupQ: QueryDef = QueryDef(
    "st18_window_rollup",
    (s, d) => typeRollup(Tables.events(s, d))
      .orderBy("event_type", "w_start"),
    Some("""WITH b AS (
              SELECT date_trunc('hour', ts) AS h,
                time_bucket(INTERVAL 5 MINUTE, ts) AS bucket,
                event_type, count(*) AS n
              FROM events GROUP BY 1, 2, 3)
            SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS w_start, event_type,
              CAST(sum(n) AS BIGINT) AS n_events,
              CAST(max(n) AS BIGINT) AS peak_bucket,
              CAST(count(*) AS BIGINT) AS n_buckets
            FROM b GROUP BY 1, 2 ORDER BY event_type, w_start"""))

  /** Watermark-scoped streaming dedup: `dropDuplicatesWithinWatermark`
    * (SPARK-42931, Spark 3.5) keeps per-key state only for the
    * watermark horizon — the semantic st06's GLOBAL dedup cannot give a
    * stream: a key re-arriving AFTER its state expired is a NEW event
    * (correct for at-least-once sources whose duplicates cluster in
    * time), and state stays bounded by the horizon instead of growing
    * with all keys ever seen. StreamingSpec proves both halves: the
    * in-horizon duplicate is suppressed AND the late re-arrival is
    * re-emitted. */
  def dedupWithinWatermarkStream(events: DataFrame,
      watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** st19 — the bounded-input form: on a batch frame every row is
    * inside one watermark horizon, so the contract collapses to
    * exactly-one-survivor-per-key; the registered readout is the
    * per-type survivor census (key-deterministic — no arbitrary
    * first-row columns ride through). Scale shape: ONE distinct on the
    * key then a bounded-domain agg; streaming state is
    * horizon-bounded where st06's global form is unbounded. */
  val dedupWithinWatermarkQ: QueryDef = QueryDef(
    "st19_dedup_within_watermark",
    (s, d) => {
      val ev = Tables.events(s, d)
      ev.select(col("event_id"), col("event_type")).distinct()
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_unique"))
        .join(broadcast(ev.groupBy("event_type")
          .agg(count(lit(1)).as("n_raw"))), Seq("event_type"))
        .withColumn("n_dupes", col("n_raw") - col("n_unique"))
        .orderBy("event_type")
    },
    Some("""WITH u AS (
              SELECT event_type, count(*) AS n_unique FROM (
                SELECT DISTINCT event_id, event_type FROM events)
              GROUP BY 1),
            r AS (
              SELECT event_type, count(*) AS n_raw FROM events GROUP BY 1)
            SELECT event_type, n_unique, n_raw,
              n_raw - n_unique AS n_dupes
            FROM u JOIN r USING (event_type)
            ORDER BY event_type"""))

  /** Dynamic-gap session windows (SPARK-36465: `session_window` with a
    * per-row gap EXPRESSION): click sessions close after 5 idle
    * minutes, everything else after 15 — the per-surface inactivity
    * policy real sessionization ships (a checkout flow and a
    * video-watch flow do not share a timeout). Grouping includes
    * event_type, so the gap is CONSTANT within each aggregation group
    * and the merge semantics are the plain session ones per group —
    * the dynamic gap selects the policy, it does not interleave
    * policies inside one session (that composition is what the
    * expression form exists for; the mirror would need Spark's
    * overlap-merge replay, documented here as out of oracle scope).
    * Sums ride as exact integer cents (st07's discipline). */
  def sessionDynamic(events: DataFrame): DataFrame =
    events
      .groupBy(
        session_window(col("ts"),
          when(col("event_type") === "click", "5 minutes")
            .otherwise("15 minutes")),
        col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .select(
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("s_start"),
        col("user_id"), col("event_type"), col("n"),
        expr("CAST(cents AS DOUBLE) / 100.0").as("sum_value"))

  /** Streaming form: watermarked, closed sessions emit in append. */
  def sessionDynamicStream(events: DataFrame,
      watermark: String = "30 minutes"): DataFrame =
    sessionDynamic(events.withWatermark("ts", watermark))

  /** st20 — the batch form (StreamingSpec proves stream==batch and the
    * 5-vs-15-minute policy split on MemoryStream input). Scale shape:
    * ONE shuffle on (user, type) with Spark's session-merge aggregate;
    * state per key is the open session only. */
  val sessionDynamicQ: QueryDef = QueryDef(
    "st20_session_dynamic_gap",
    (s, d) => sessionDynamic(Tables.events(s, d))
      .orderBy("user_id", "event_type", "s_start"),
    Some("""WITH x AS (
              SELECT user_id, event_type, ts,
                CAST(round(value * 100) AS BIGINT) AS cents,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR ts >= lag(ts) OVER w +
                         (CASE WHEN event_type = 'click'
                               THEN INTERVAL 5 MINUTE
                               ELSE INTERVAL 15 MINUTE END)
                     THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts)),
            g AS (
              SELECT *, sum(new_s) OVER (PARTITION BY user_id, event_type
                ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
              FROM x)
            SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
              user_id, event_type, count(*) AS n,
              CAST(sum(cents) AS BIGINT) / 100.0 AS sum_value
            FROM g GROUP BY user_id, event_type, sid
            ORDER BY user_id, event_type, s_start"""))

  /** Stream-static ANTI-join gate: drop every event whose user is on
    * the static blocklist (negative-balance customers), keep the rest —
    * the in-flight form of x40's batch blocklist gate, and the
    * admission-control shape every streaming ingest pipeline runs
    * BEFORE state-heavy operators (each blocked row dropped here never
    * enters a join buffer or window state downstream). Stream-static
    * LEFT ANTI is stateless on the stream side: the static side is a
    * broadcast, no watermark needed, append mode.
    *
    * Same library code drives the st22 batch twin (oracled via NOT
    * EXISTS) and the StreamingSpec MemoryStream run that asserts
    * stream == batch and that a blocked user's event never emits. */
  def blockGate(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
      broadcast(customers.filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("blocked_id"))),
      col("user_id") === col("blocked_id"), "left_anti")

  /** st22 — [[blockGate]]'s batch twin: per-type survivor census after
    * the anti-join. Integer-cents summation keeps the double exact. */
  val blockGateQ: QueryDef = QueryDef(
    "st22_stream_blocklist_gate",
    (s, d) =>
      blockGate(Tables.events(s, d), Tables.customer(s, d))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          (sum(expr("CAST(round(value * 100) AS BIGINT)")) / 100.0)
            .as("sum_value"))
        .orderBy("event_type"),
    Some("""SELECT event_type, count(*) AS n,
              CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                / 100.0 AS sum_value
            FROM events e
            WHERE NOT EXISTS (
              SELECT 1 FROM customer c
              WHERE c.c_custkey = e.user_id AND c.c_acctbal < 0)
            GROUP BY 1 ORDER BY 1"""))

  /** st23 — [[sessionTimerStream]]'s batch twin (StreamingSpec proves
    * stream==batch under RocksDB with a watermark flush): per-user
    * timer-closed sessions as exact microsecond integers — no floats
    * anywhere. The oracle is the same gaps-and-islands rewrite at
    * microsecond precision (`epoch_us`, the q50 discipline: never
    * `epoch()` — events carry sub-second time and Spark truncates). */
  val sessionTimerQ: QueryDef = QueryDef(
    "st23_session_timer_close",
    (s, d) =>
      sessionTimerBatch(Tables.events(s, d), 30L * 60 * 1000000)
        .select(col("user_id"), col("start_us"), col("end_us"),
          col("n_events"))
        .orderBy("user_id", "start_us"),
    Some("""WITH e AS (
              SELECT user_id, epoch_us(ts) AS us FROM events),
            x AS (
              SELECT user_id, us,
                CASE WHEN lag(us, 1) OVER w IS NULL
                       OR us - lag(us, 1) OVER w >= 1800000000
                     THEN 1 ELSE 0 END AS new_s
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
            g AS (
              SELECT user_id, us,
                sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                                 ROWS UNBOUNDED PRECEDING) AS sid
              FROM x)
            SELECT user_id, min(us) AS start_us, max(us) AS end_us,
              count(*) AS n_events
            FROM g GROUP BY user_id, sid
            ORDER BY user_id, start_us"""))

  /** st24 — per-user funnel STATE MACHINE via transformWithState (the
    * real-time funnel tracker product analytics ships next to st09's
    * batch census: a monotone three-slot automaton per user — first
    * view, first click ≥ that view, first purchase ≥ that click —
    * updated as events stream in, emitting the user's stage on every
    * transition). The pattern the other v2 processors don't cover:
    * MONOTONE-DAG state (slots only ever fill, never mutate), so the
    * final state is a pure function of the event set under in-order
    * delivery — which is the operating contract (watermark-ordered
    * replay; the spec feeds event-time order, the production deploy
    * reads a time-ordered log — same assumption st09's batch form
    * makes implicitly by seeing all data).
    *
    * State: one (v, c, p) triple per user, Long.MinValue sentinel for
    * unset — bounded by users, never by events. Emission: update mode,
    * one row per touched user per micro-batch. */
  class FunnelStateProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, String, Long), (Long, Long, Long, Long, Long)] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, TimerValues, ValueState}
    private val Unset = Long.MinValue
    @transient private var st: ValueState[(Long, Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long)](
        "funnel", org.apache.spark.sql.Encoders.product[(Long, Long, Long)],
        TTLConfig.NONE)
    override def handleInputRows(key: Long,
        rows: Iterator[(Long, String, Long)],
        timerValues: TimerValues): Iterator[(Long, Long, Long, Long, Long)] = {
      var (v, c, p) = if (st.exists()) st.get() else (Unset, Unset, Unset)
      // per-key micro-batch slice sorted for in-batch disorder; ties on
      // the same microsecond break in funnel order (view < click <
      // purchase) so a click sharing its view's exact timestamp still
      // advances the automaton — matching the batch twin's `us >= v_us`
      // window semantics.
      def stepRank(t: String): Int = t match {
        case "view" => 0; case "click" => 1; case "purchase" => 2
        case _ => 3
      }
      rows.toArray.sortBy(r => (r._3, stepRank(r._2))).foreach {
        case (_, t, us) =>
        t match {
          case "view" if v == Unset => v = us
          case "click" if v != Unset && c == Unset && us >= v => c = us
          case "purchase" if c != Unset && p == Unset && us >= c => p = us
          case _ => ()
        }
      }
      st.update((v, c, p))
      val stage =
        if (p != Unset) 3L else if (c != Unset) 2L else if (v != Unset) 1L
        else 0L
      Iterator.single((key, stage, v, c, p))
    }
  }

  /** st24 stream driver: funnel stages in update mode. */
  def funnelStateStream(events: Dataset[(Long, String, Long)])
      : Dataset[(Long, Long, Long, Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new FunnelStateProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** st24 batch twin — the per-user funnel-stage frame (q60's chained
    * min-window resolution, per-user detail instead of the census):
    * oracle-exact; StreamingSpec proves the state machine's final
    * snapshot equals this frame under in-order MemoryStream delivery. */
  val funnelStateQ: QueryDef = {
    def sql(epochUs: String): String =
      s"""WITH e AS (
            SELECT user_id, event_type, $epochUs(ts) AS us FROM events),
          s1 AS (
            SELECT user_id, event_type, us,
              min(CASE WHEN event_type = 'view' THEN us END)
                OVER (PARTITION BY user_id) AS v_us
            FROM e),
          s2 AS (
            SELECT user_id, event_type, us, v_us,
              min(CASE WHEN event_type = 'click' AND us >= v_us
                THEN us END) OVER (PARTITION BY user_id) AS c_us
            FROM s1),
          s3 AS (
            SELECT user_id, v_us, c_us,
              min(CASE WHEN event_type = 'purchase' AND us >= c_us
                THEN us END) OVER (PARTITION BY user_id) AS p_us
            FROM s2),
          u AS (
            SELECT user_id, max(v_us) AS v_us, max(c_us) AS c_us,
              max(p_us) AS p_us
            FROM s3 GROUP BY 1)
          SELECT user_id,
            CAST(CASE WHEN p_us IS NOT NULL THEN 3
              WHEN c_us IS NOT NULL THEN 2
              WHEN v_us IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage,
            v_us, c_us, p_us
          FROM u ORDER BY user_id"""
    QueryDef(
      "st24_funnel_state",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("g_st24_events")
        s.sql(sql("unix_micros")
          .replace("FROM events", "FROM g_st24_events"))
      },
      Some(sql("epoch_us")))
  }

  /** st25 — per-user recent-path buffer via transformWithState
    * LIST STATE (the last v2 state type the engine didn't exercise:
    * st12b/st23 cover ValueState + timers/TTL, st13b MapState, st24 the
    * ValueState automaton — ListState is the bounded-buffer primitive
    * behind every "recent activity" feed / session n-gram tracker):
    * per user, keep the last 3 (us, event_id, type) entries — clear +
    * re-put of the trimmed buffer, the documented bounded-window
    * ListState idiom — plus a ValueState event counter, and emit the
    * user's current path (types joined oldest→newest) per touched user
    * per micro-batch.
    *
    * State bound: ≤ 3 tuples + 1 long per user — bounded by USERS,
    * never by events (the STATE_SIZE.json discipline). In-batch slices
    * sort by (us, event_id) — the total order the batch twin uses, so
    * the final snapshot is a pure function of the event set under
    * in-order delivery (st24's contract). */
  class PathBufferProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, String, Long, Long), (Long, Long, String, Long)] {
    import org.apache.spark.sql.streaming.{ListState, TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var buf: ListState[(Long, Long, String)] = _
    @transient private var cnt: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[(Long, Long, String)](
        "recent",
        org.apache.spark.sql.Encoders.product[(Long, Long, String)],
        TTLConfig.NONE)
      cnt = getHandle.getValueState[Long]("n_events",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: Long,
        rows: Iterator[(Long, String, Long, Long)],
        timerValues: TimerValues): Iterator[(Long, Long, String, Long)] = {
      val slice = rows.toArray.sortBy(r => (r._3, r._4))
      var cur = buf.get().toArray
      slice.foreach { case (_, t, us, eid) =>
        cur = (cur :+ ((us, eid, t))).takeRight(3)
      }
      buf.clear()
      if (cur.nonEmpty) buf.put(cur)
      val n = (if (cnt.exists()) cnt.get() else 0L) + slice.length
      cnt.update(n)
      val path = cur.map(_._3).mkString(">")
      val lastUs = if (cur.isEmpty) Long.MinValue else cur.last._1
      Iterator.single((key, n, path, lastUs))
    }
  }

  /** st25 stream driver: recent-path snapshots in update mode. */
  def pathBufferStream(events: Dataset[(Long, String, Long, Long)])
      : Dataset[(Long, Long, String, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new PathBufferProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** st25 batch twin — each user's event count and last-3 event-type
    * path over the total (us, event_id) order: oracle-exact;
    * StreamingSpec proves the ListState buffer's final snapshot equals
    * this frame under in-order MemoryStream delivery. */
  val pathBufferQ: QueryDef = {
    def sql(epochUs: String, agg: String): String =
      s"""WITH e AS (
            SELECT user_id, event_type, $epochUs(ts) AS us, event_id
            FROM events),
          r AS (
            SELECT user_id, event_type, us, event_id,
              row_number() OVER (PARTITION BY user_id
                ORDER BY us DESC, event_id DESC) AS rn,
              count(*) OVER (PARTITION BY user_id) AS n_events
            FROM e)
          SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
            $agg AS last3_path,
            CAST(max(us) AS BIGINT) AS last_us
          FROM r WHERE rn <= 3
          GROUP BY user_id, n_events ORDER BY user_id"""
    QueryDef(
      "st25_path_buffer",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("g_st25_events")
        s.sql(sql("unix_micros",
          """array_join(transform(
               array_sort(collect_list(struct(us, event_id, event_type))),
               x -> x.event_type), '>')""")
          .replace("FROM events", "FROM g_st25_events"))
      },
      Some(sql("epoch_us",
        "string_agg(event_type, '>' ORDER BY us, event_id)")))
  }

  /** st26 shared rule — the token bucket (the RFC-style rate limiter
    * production gateways run per key: capacity C tokens, refill r/s,
    * admit iff a full token is available): C = 5, refill 1 token/hour,
    * e6 fixed point — gain = Δµs DIV 3600 is EXACT in e6 units
    * (10⁶/3 600·10⁶ per µs). Unlike ml30's CUSUM the recurrence clamps
    * on BOTH sides (0 via admission feedback, C at the top), so no
    * prefix closed form exists — the batch twin runs it as an IN-ROW
    * fold over the per-user (us, event_id)-ordered list (aggregate()
    * HOF on Spark, list_reduce on DuckDB): deterministic integer math,
    * zero extra shuffles, state bounded by one user's events per row.
    * The stream form is the same fold through ValueState. */
  private val BucketCap = 5000000L // 5 tokens, e6
  private def bucketStep(tok: Long, last: Long, us: Long)
      : (Long, Long, Boolean) = {
    val tok2 = math.min(BucketCap, tok + (us - last) / 3600L)
    if (tok2 >= 1000000L) (tok2 - 1000000L, us, true) else (tok2, us, false)
  }

  /** st26 stream driver state: one (tokens_e6, last_us, admitted,
    * n_events) quadruple per user. */
  class TokenBucketProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Long), (Long, Long, Long, Long, Long)] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var st: ValueState[(Long, Long, Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long, Long)](
        "bucket",
        org.apache.spark.sql.Encoders.product[(Long, Long, Long, Long)],
        TTLConfig.NONE)
    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long, Long)],
        timerValues: TimerValues): Iterator[(Long, Long, Long, Long, Long)] = {
      val slice = rows.toArray.sortBy(r => (r._2, r._3))
      var (tok, last, adm, n) =
        if (st.exists()) st.get()
        else (BucketCap, slice.head._2, 0L, 0L)
      slice.foreach { case (_, us, _) =>
        val (t2, l2, admit) = bucketStep(tok, last, us)
        tok = t2; last = l2; if (admit) adm += 1; n += 1
      }
      st.update((tok, last, adm, n))
      Iterator.single((key, n, adm, n - adm, tok))
    }
  }

  /** st26 stream driver: token-bucket admission snapshots, update mode. */
  def tokenBucketStream(events: Dataset[(Long, Long, Long)])
      : Dataset[(Long, Long, Long, Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new TokenBucketProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** st26 batch twin — the per-user admission census from the same
    * fold, run in-row; oracle-exact, StreamingSpec proves the stream
    * snapshot equals it under in-order delivery. */
  val tokenBucketQ: QueryDef = QueryDef(
    "st26_token_bucket",
    (s, d) => {
      Tables.events(s, d).createOrReplaceTempView("g_st26_events")
      s.sql(s"""
        WITH e AS (
          SELECT user_id, unix_micros(ts) AS us, event_id
          FROM g_st26_events),
        lst AS (
          SELECT user_id,
            transform(array_sort(collect_list(struct(us, event_id))),
              x -> x.us) AS evs
          FROM e GROUP BY 1),
        fold AS (
          SELECT user_id, size(evs) AS n_events,
            aggregate(evs,
              named_struct('tok', CAST($BucketCap AS BIGINT),
                'lastu', evs[0], 'adm', CAST(0 AS BIGINT)),
              (acc, x) -> named_struct(
                'tok',
                least($BucketCap, acc.tok + (x - acc.lastu) DIV 3600)
                  - CASE WHEN least($BucketCap,
                      acc.tok + (x - acc.lastu) DIV 3600) >= 1000000
                    THEN 1000000 ELSE 0 END,
                'lastu', x,
                'adm',
                acc.adm + CASE WHEN least($BucketCap,
                    acc.tok + (x - acc.lastu) DIV 3600) >= 1000000
                  THEN 1 ELSE 0 END)) AS st
          FROM lst)
        SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
          st.adm AS n_admitted,
          CAST(n_events - st.adm AS BIGINT) AS n_rejected,
          st.tok AS final_tokens_e6
        FROM fold ORDER BY user_id""")
    },
    Some(s"""WITH e AS (
               SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
             lst AS (
               SELECT user_id,
                 list(us ORDER BY us, event_id) AS evs
               FROM e GROUP BY 1),
             fold AS (
               SELECT user_id, len(evs) AS n_events,
                 list_reduce(
                   list_prepend(
                     struct_pack(tok := CAST($BucketCap AS BIGINT),
                       lastu := evs[1], adm := CAST(0 AS BIGINT),
                       us := evs[1]),
                     list_transform(evs, u ->
                       struct_pack(tok := CAST(0 AS BIGINT),
                         lastu := CAST(0 AS BIGINT),
                         adm := CAST(0 AS BIGINT), us := u))),
                   (acc, x) -> struct_pack(
                     tok :=
                       least($BucketCap, acc.tok + (x.us - acc.lastu) // 3600)
                         - CASE WHEN least($BucketCap,
                             acc.tok + (x.us - acc.lastu) // 3600) >= 1000000
                           THEN 1000000 ELSE 0 END,
                     lastu := x.us,
                     adm :=
                       acc.adm + CASE WHEN least($BucketCap,
                           acc.tok + (x.us - acc.lastu) // 3600) >= 1000000
                         THEN 1 ELSE 0 END,
                     us := x.us)) AS st
               FROM lst)
             SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
               CAST(st.adm AS BIGINT) AS n_admitted,
               CAST(n_events - st.adm AS BIGINT) AS n_rejected,
               CAST(st.tok AS BIGINT) AS final_tokens_e6
             FROM fold ORDER BY user_id"""))

  // ---- st27: incremental curation manifest (VERDICT r14 ask #2) ----

  /** st27 stage-1 state: ONE boolean marker per text fingerprint —
    * state is bounded by DISTINCT TEXTS ever ingested, never by event
    * volume (a duplicate adds zero state; the STATE_SIZE.json
    * discipline — production bounds the horizon further with a TTL on
    * the reprocessing window). In-batch slices sort by doc_id, so
    * under in-order delivery the first-seen doc IS the minimum id —
    * exactly x62 stage 1's min(doc_id)-per-text rule (st24/st25's
    * in-order contract). Keyed by xxhash64(text), hash-collision-exact
    * (d04's documented pattern): a fingerprint collision would merge
    * two distinct texts on the stream side only. */
  class ManifestDedupProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, java.sql.Timestamp, Long, String, Long),
        (Long, String, Long, Boolean)] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var seen: ValueState[Boolean] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        org.apache.spark.sql.Encoders.scalaBoolean, TTLConfig.NONE)
    override def handleInputRows(key: Long,
        rows: Iterator[(Long, java.sql.Timestamp, Long, String, Long)],
        timerValues: TimerValues): Iterator[(Long, String, Long, Boolean)] = {
      val slice = rows.toArray.sortBy(_._3)
      val already = seen.exists()
      if (!already) seen.update(true)
      slice.iterator.zipWithIndex.map { case ((_, _, id, text, nc), i) =>
        (id, text, nc, !already && i == 0)
      }
    }
  }

  /** st27 stream driver — the INCREMENTAL form of x62's curation
    * manifest (its batch twin [[incrementalManifestQ]] is the x62
    * restriction to the incrementalizable stages): a continuously
    * ingesting corpus flows through watermarked event-time ingest →
    * stateful exact dedup (st06's global rule as transformWithState
    * ValueState, late docs behind the watermark dropped BY THE ENGINE
    * — rows with ingest_ts ≤ watermark; LATE_DATA.json documents the
    * boundary) → per-doc survival decisions consumed by
    * [[incrementalManifestAccounting]] in foreachBatch. `docs` needs
    * (ingest_ts timestamp, doc_id, text, n_chars). Output: one
    * (doc_id, text, n_chars, survived_dedup) decision per admitted
    * doc. Update mode: every admitted doc's decision emits exactly
    * once, in its arrival batch. */
  def incrementalManifestStream(docs: DataFrame,
      watermark: String = "1 hour"): Dataset[(Long, String, Long, Boolean)] = {
    import docs.sparkSession.implicits._
    docs
      .select(xxhash64(col("text")).as("fp"), col("ingest_ts"),
        col("doc_id"), col("text"), col("n_chars"))
      .withWatermark("ingest_ts", watermark)
      .as[(Long, java.sql.Timestamp, Long, String, Long)]
      .groupByKey(_._1)
      .transformWithState(new ManifestDedupProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Update())
  }

  /** Per-micro-batch manifest accounting over the stream's decisions
    * (run inside foreachBatch, where the frame is a plain batch frame —
    * the standard pattern for the join-shaped stages a pure streaming
    * graph can't express): stages 2-4 run the SAME engines as x62's
    * batch chain (Curation.mfQualityGate / mfHoldout / mfDecontam
    * against the FIXED benchmark gram index), so per-stage counts
    * summed across batches equal the batch twin exactly — every stage
    * decision is per-doc against fixed reference data, hence
    * batch-local. StreamingSpec proves the equality end to end. */
  def incrementalManifestAccounting(batch: DataFrame,
      evalGrams: DataFrame): DataFrame = {
    val s1 = graft.ext.Curation.mfWithHx(
      batch.filter(col("survived")).drop("survived"))
    val s2 = graft.ext.Curation.mfQualityGate(s1)
    val s3 = graft.ext.Curation.mfHoldout(s2)
    val s4 = graft.ext.Curation.mfDecontam(s3, evalGrams)
    graft.ext.Curation.mfAcctFrame(Seq(
      ("exact_dedup", batch, s1), ("quality_gate", s1, s2),
      ("eval_holdout", s2, s3), ("decontam", s3, s4)))
  }

  /** st27 — incremental curation manifest, BATCH TWIN (the oracled
    * restriction of x62 to its incrementalizable stages): exact dedup →
    * structural quality gate → eval holdout → 13-gram decontamination,
    * as ONE per-stage accounting frame over the documents corpus —
    * generated by the SAME stage engine and mirror-CTE generators as
    * x62 (Curation.manifestBuild/manifestSql over stage subset
    * {dedup, gate, holdout, decontam}), so the twin cannot drift from
    * the composed batch flagship. The OMITTED x62 stages are exactly
    * the non-incremental ones: MinHash fuzzy dedup needs pair joins
    * across the full corpus, and domain-cap/DSIR are corpus-global
    * selections — a production incremental pipeline runs those as
    * periodic batch compactions over the accumulated survivors, not
    * per micro-batch.
    *
    * The STREAM form ([[incrementalManifestStream]] +
    * [[incrementalManifestAccounting]]) runs the same four stages
    * continuously: watermarked ingest (late docs dropped by the
    * engine at ingest_ts ≤ watermark — LATE_DATA.json's st27 section
    * audits observed == contract-derived drops), transformWithState
    * exact-dedup state bounded by distinct texts (STATE_SIZE.json's
    * st27 entry), stages 2-4 per batch in foreachBatch against the
    * fixed benchmark gram index. StreamingSpec asserts the summed
    * per-batch accounting equals this twin under in-order delivery.
    *
    * Scale shape: inherits the component stages' laws — hash-agg
    * dedup, per-row gate/holdout projections, broadcast semi-join
    * decontam against the benchmark-sized gram index; stream state is
    * one marker per distinct text. */
  val incrementalManifestQ: QueryDef = QueryDef(
    "st27_incremental_manifest",
    graft.ext.Curation.manifestBuild(ccStage2 = false,
      stages = Seq(0, 2, 3, 4)),
    Some(graft.ext.Curation.manifestSql(ccStage2 = false,
      stages = Seq(0, 2, 3, 4))))

  val all: Seq[QueryDef] =
    Seq(tumblingQ, slidingQ, sessionQ, windowDistinctQ, intervalJoinQ,
      streamLeftJoinQ, dedupBatchQ, enrichQ, windowSketchQ, funnelQ,
      retentionQ, topTypesQ, streamFullJoinQ, runningMaxBatchQ,
      typeCountsBatchQ, windowAnomalyQ, streamSemiJoinQ, windowRollupQ,
      dedupWithinWatermarkQ, sessionDynamicQ, cepAlarmQ, blockGateQ,
      sessionTimerQ, funnelStateQ, pathBufferQ, tokenBucketQ,
      incrementalManifestQ)
}
