package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp
import scala.collection.mutable.ArrayBuffer

/** Structured Streaming over the events stream (SURVEY.md §2c):
  * watermarked windowed aggregation and stateful sessionization. The
  * reference automates its batch pipeline with a job scheduler; the
  * streaming expression of the same logic is incremental state instead
  * of re-runs.
  */
case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

case class SessionAcc(start: Timestamp, end: Timestamp, n: Long, sum: Double)

case class UserLifetime(user_id: Long, n_events: Long, cents: Long)

/** Per-user lifetime counters on the Spark 4 `transformWithState`
  * tier (the arbitrary-stateful-processing v2 API, RocksDB-backed
  * typed state): two `ValueState` cells per user, updated per
  * micro-batch, emitting the running totals in Update mode. Monetary
  * value accumulates in integer cents so the running sum is exact and
  * order-independent — streamed totals equal the batch aggregate
  * bit-for-bit (spec'd).
  */
class LifetimeProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Event, UserLifetime] {
  import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
  import org.apache.spark.sql.{Encoders, streaming}

  @transient private var nState: ValueState[Long] = _
  @transient private var centsState: ValueState[Long] = _

  override def init(outputMode: OutputMode,
      timeMode: TimeMode): Unit = {
    nState = getHandle.getValueState[Long]("n", Encoders.scalaLong,
      TTLConfig.NONE)
    centsState = getHandle.getValueState[Long]("cents", Encoders.scalaLong,
      TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: streaming.TimerValues): Iterator[UserLifetime] = {
    var n = if (nState.exists()) nState.get() else 0L
    var cents = if (centsState.exists()) centsState.get() else 0L
    rows.foreach { e =>
      n += 1
      cents += math.round(e.value * 100)
    }
    nState.update(n)
    centsState.update(cents)
    Iterator.single(UserLifetime(key, n, cents))
  }
}

case class TypeCount(user_id: Long, event_type: String, n: Long)

/** Per-user per-event-type running counters on the `MapState` cell of
  * the `transformWithState` tier: one RocksDB map per user keyed by
  * event type — the state shape for per-key sub-dimensions whose
  * domain isn't known up front (a `ValueState[Map]` would rewrite the
  * whole map every batch; `MapState` reads and writes only the touched
  * sub-keys). Update mode: each batch emits the new running totals of
  * ONLY the types that batch touched.
  */
class TypeCountProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Event, TypeCount] {
  import org.apache.spark.sql.streaming.{MapState, TimeMode, TTLConfig}
  import org.apache.spark.sql.{Encoders, streaming}

  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long]("counts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: streaming.TimerValues): Iterator[TypeCount] = {
    val touched = scala.collection.mutable.LinkedHashSet.empty[String]
    rows.foreach { e =>
      val c = if (counts.containsKey(e.event_type))
        counts.getValue(e.event_type) else 0L
      counts.updateValue(e.event_type, c + 1)
      touched += e.event_type
    }
    touched.iterator.map(t => TypeCount(key, t, counts.getValue(t)))
  }
}

case class RecentEvents(user_id: Long, event_ids: Array[Long])

/** Bounded per-user recent-event history on the `ListState` cell: the
  * last `keep` event ids in arrival order. `appendValue` is O(1) per
  * event (RocksDB merge operand — no read-modify-write of the whole
  * list on the hot path); the trim rewrites the list only when a batch
  * actually overflows the bound, so steady-state cost is append-only.
  * The bounded-recent-history shape behind "last N items" feature
  * serving.
  */
class RecentEventsProcessor(keep: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Event, RecentEvents] {
  import org.apache.spark.sql.streaming.{ListState, TimeMode, TTLConfig}
  import org.apache.spark.sql.{Encoders, streaming}

  @transient private var recent: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    recent = getHandle.getListState[Long]("recent", Encoders.scalaLong,
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: streaming.TimerValues): Iterator[RecentEvents] = {
    rows.foreach(e => recent.appendValue(e.event_id))
    val all = recent.get().toArray
    val kept = if (all.length > keep) {
      val t = all.takeRight(keep)
      recent.put(t)
      t
    } else all
    Iterator.single(RecentEvents(key, kept))
  }
}

case class SessionOut(user_id: Long, t_start: Timestamp, t_end: Timestamp,
    n_events: Long, sum_value: Double)

/** Gap sessionizer on the `transformWithState` tier with EVENT-TIME
  * TIMERS: the open session lives in a typed `ValueState[SessionAcc]`
  * cell and a registered timer at (session end + gap) closes it when
  * the watermark passes — the v2-API twin of
  * [[EventsStream.updateSessions]] (flatMapGroupsWithState), with the
  * timeout expressed as a first-class timer instead of
  * `setTimeoutTimestamp`. Exactly one timer is live per key: the
  * registered expiry is tracked in its own state cell and the stale
  * timer is deleted whenever an event extends the session (otherwise
  * every extension would leave an earlier timer behind to fire into
  * the middle of the still-open session).
  *
  * Session semantics are identical to the v1 sessionizer (and spec'd
  * against the same batch oracle): stragglers within the gap extend
  * the session backward; stragglers more than a gap before the open
  * session emit as their own closed single-event session.
  */
class SessionProcessor(gapMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Event, SessionOut] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode,
    TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders

  @transient private var acc: ValueState[SessionAcc] = _
  @transient private var tmr: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    acc = getHandle.getValueState[SessionAcc]("acc",
      Encoders.product[SessionAcc], TTLConfig.NONE)
    tmr = getHandle.getValueState[Long]("tmr", Encoders.scalaLong,
      TTLConfig.NONE)
  }

  // the v1 sessionizer's conversion, shared so the two tiers can never
  // drift on timestamp precision
  private def micros(t: Timestamp): Long = EventsStream.micros(t)

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[SessionOut] = {
    val gapUs = gapMs * 1000L
    val out = ArrayBuffer.empty[SessionOut]
    var cur = if (acc.exists()) Some(acc.get()) else None
    rows.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
      val eUs = micros(e.ts)
      cur match {
        case Some(s) if eUs >= micros(s.start) - gapUs &&
            eUs - micros(s.end) <= gapUs =>
          val start = if (eUs < micros(s.start)) e.ts else s.start
          val end = if (eUs > micros(s.end)) e.ts else s.end
          cur = Some(SessionAcc(start, end, s.n + 1, s.sum + e.value))
        case Some(s) if eUs < micros(s.start) =>
          out += SessionOut(key, e.ts, e.ts, 1L, e.value)
        case Some(s) =>
          out += SessionOut(key, s.start, s.end, s.n, s.sum)
          cur = Some(SessionAcc(e.ts, e.ts, 1L, e.value))
        case None =>
          cur = Some(SessionAcc(e.ts, e.ts, 1L, e.value))
      }
    }
    cur.foreach { s =>
      acc.update(s)
      // round the microsecond end UP to ms (truncation would fire the
      // timer just before the gap boundary and split a boundary event)
      val expiry = (micros(s.end) + 999L) / 1000L + gapMs
      val prev = if (tmr.exists()) Some(tmr.get()) else None
      if (!prev.contains(expiry)) {
        prev.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(expiry)
        tmr.update(expiry)
      }
    }
    out.iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[SessionOut] = {
    // only the CURRENT timer closes the session — a stale expiry that
    // raced deletion must not fire into an extended session
    if (acc.exists() && tmr.exists() &&
        tmr.get() == expired.getExpiryTimeInMs) {
      val s = acc.get()
      acc.clear(); tmr.clear()
      Iterator.single(SessionOut(key, s.start, s.end, s.n, s.sum))
    } else Iterator.empty
  }
}

object EventsStream {

  /** File-source stream over the events table: new parquet files landing
    * in `dir` become micro-batches (the streaming twin of
    * Tables.events, including the nano→micro timestamp conversion).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // a stream must DECLARE its schema up front, and the generator has
    // shipped `ts` as both TIMESTAMP(NANOS) (reads as long) and plain
    // TIMESTAMP-micros — one cheap batch peek picks the right contract
    // (declaring long against a timestamp file would silently
    // reinterpret micros as nanos: 2024 collapses to 1970)
    val nanosTs = spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == LongType
    val tsField =
      if (nanosTs) StructField("ts", LongType)
      else StructField("ts", TimestampType)
    val schema = StructType(Seq(
      StructField("event_id", LongType), tsField,
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    if (nanosTs) raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Watermarked tumbling-window counts per event type. Late data beyond
    * the watermark is dropped; state is bounded by (watermark horizon /
    * window) × |types|.
    */
  def windowedCounts(events: DataFrame, watermark: String = "30 minutes",
      win: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Sliding (hopping) windows: each event lands in window-length ÷
    * hop overlapping windows (here 1 h windows every 15 min — the
    * trailing-hour dashboard refreshed per quarter hour). Same
    * watermark-bounded state as [[windowedCounts]]; Spark expands the
    * event into its windows map-side, so the shuffle carries
    * (window, type) partials, not raw events × windows.
    */
  def slidingCounts(events: DataFrame, watermark: String = "30 minutes",
      win: String = "1 hour", hop: String = "15 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win, hop), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Streaming exact dedup on `key` ALONE:
    * `dropDuplicatesWithinWatermark` keys state by `key` (not the
    * (key, ts) pair — a retried event re-stamped with a new arrival
    * time is still a duplicate) and expires it at the watermark
    * horizon, so state is bounded by arrival rate × horizon, not
    * stream length. The streaming twin of the reference's
    * dedup-on-append load (which [[DeltaSink]] applies cross-batch
    * against the table; this dedupes in-flight, within the horizon).
    */
  def dedupStream(events: DataFrame, key: String, tsCol: String = "ts",
      watermark: String = "30 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(key)

  /** Watermarked stream–stream interval join: each purchase joins the
    * clicks the same user made in the preceding `horizonMinutes` —
    * last-touch-style attribution. Both sides carry a watermark and the
    * join condition bounds event-time distance, so the state store
    * retains only `horizon + watermark` of each stream per key — the
    * ONLY formulation of a stream-stream join whose state doesn't grow
    * without bound.
    */
  def clickAttribution(events: DataFrame, horizonMinutes: Int = 60,
      watermark: String = "30 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value").as("amount"))
      .withWatermark("purchase_ts", watermark)
    purchases.join(clicks,
      col("c_user") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizonMinutes MINUTES"))
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("purchase_ts"), col("amount"), col("click_id"), col("click_ts"))
  }

  /** LEFT OUTER stream–stream interval join: like [[clickAttribution]]
    * but purchases WITHOUT a preceding click survive, null-padded —
    * emitted only once the watermark proves no matching click can
    * still arrive (the outer-join-needs-watermark rule: the engine
    * must know when to give up on the match before it can emit the
    * null row). Both the join condition's time bound and the
    * watermark bound the state store, so an unbounded stream holds
    * only the horizon's worth of rows.
    */
  def clickAttributionOuter(events: DataFrame, horizonMinutes: Int = 60,
      watermark: String = "30 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value").as("amount"))
      .withWatermark("purchase_ts", watermark)
    purchases.join(clicks,
      col("c_user") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizonMinutes MINUTES"),
      "leftOuter")
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("purchase_ts"), col("amount"), col("click_id"), col("click_ts"))
  }

  /** FULL OUTER stream–stream interval join — completes the join-type
    * matrix (inner [[clickAttribution]], left outer
    * [[clickAttributionOuter]]): purchases without a click AND clicks
    * that never converted both survive null-padded, each emitted only
    * once its watermark proves no partner can still arrive. Same
    * bounded state: horizon + watermark per side.
    */
  def clickAttributionFull(events: DataFrame, horizonMinutes: Int = 60,
      watermark: String = "30 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value").as("amount"))
      .withWatermark("purchase_ts", watermark)
    purchases.join(clicks,
      col("c_user") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizonMinutes MINUTES"),
      "fullOuter")
      .select(coalesce(col("p_user"), col("c_user")).as("user_id"),
        col("purchase_id"), col("purchase_ts"), col("amount"),
        col("click_id"), col("click_ts"))
  }

  /** Per-user lifetime stats via Spark 4's `transformWithState` — the
    * modern stateful tier next to `flatMapGroupsWithState`
    * ([[sessionize]]): typed per-key state cells in the (RocksDB)
    * state store, running totals emitted every micro-batch. Requires
    * the RocksDB state-store provider (set by the caller's session
    * conf; the spec does).
    */
  def lifetimeStats(events: DataFrame): Dataset[UserLifetime] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new LifetimeProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  /** Per-user per-type running counts on the `MapState` tier (see
    * [[TypeCountProcessor]]); Update mode, RocksDB provider required. */
  def typeCounts(events: Dataset[Event]): Dataset[TypeCount] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new TypeCountProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  /** Last-`keep` event ids per user on the `ListState` tier (see
    * [[RecentEventsProcessor]]); Update mode, RocksDB provider
    * required. */
  def recentEvents(events: Dataset[Event], keep: Int = 5): Dataset[RecentEvents] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new RecentEventsProcessor(keep), TimeMode.None(),
        OutputMode.Update())
  }

  /** Gap sessionization on the `transformWithState` tier (see
    * [[SessionProcessor]]): event-time timers close sessions once the
    * watermark passes (end + gap); Append mode — only closed sessions
    * emit. Requires the RocksDB state-store provider and an upstream
    * watermark on `ts` (the spec sets both); semantics equal
    * [[sessionize]] and the batch sessionizer.
    */
  def sessionizeTws(events: Dataset[Event], gapMinutes: Int = 30,
      watermark: String = "30 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMinutes * 60000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Stream–static enrichment join: each micro-batch joins the static
    * dimension as of that batch (re-planned per batch, so a broadcast-
    * able dim stays a broadcast; no state store involved — the static
    * side is not watermarked and never expires). The third join mode
    * after stream-stream ([[clickAttribution]]) and batch-batch: the
    * shape a pipeline uses to tag a live event stream with slowly-
    * changing reference data.
    */
  def enrich(events: DataFrame, dim: DataFrame, eventKey: String,
      dimKey: String, joinType: String = "left"): DataFrame =
    events.join(dim, col(eventKey) === col(dimKey), joinType)

  /** Stateful sessionization with `flatMapGroupsWithState`: per-user
    * session state, closed either by a gap-exceeding event or by event-
    * time timeout at (session end + gap) past the watermark. Emits only
    * closed sessions (append mode).
    */
  /** Built-in `session_window` sessionization for streams: the SAME
    * expression as the batch `queries.Events.sessionWindow`, run
    * incrementally — Spark merges per-event [ts, ts+gap) windows in
    * state and emits a session once the watermark passes its end.
    * Next to [[sessionize]] (custom flatMapGroupsWithState) this is
    * the declarative tier: no user state code, same gap semantics.
    */
  def sessionWindowAgg(events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "30 minutes"): DataFrame = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupBy($"user_id", session_window($"ts", s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"w.start".as("t_start"), $"w.end".as("t_end"),
        $"n_events")
  }

  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
      watermark: String = "30 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateSessions(gapMs))
  }

  /** Microsecond-precision epoch value — Timestamp.getTime is only ms
    * and would silently truncate against the batch sessionizer.
    */
  private[streaming] def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private[streaming] def updateSessions(gapMs: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessionAcc]): Iterator[SessionOut] = {
    val gapUs = gapMs * 1000L
    val out = ArrayBuffer.empty[SessionOut]
    def close(s: SessionAcc): Unit =
      out += SessionOut(userId, s.start, s.end, s.n, s.sum)

    if (state.hasTimedOut) {
      state.getOption.foreach(close)
      state.remove()
    } else {
      var cur = state.getOption
      // micro-batch iterators are not time-ordered — sort before folding
      events.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
        val eUs = micros(e.ts)
        cur match {
          // event belongs to the open session if it lands within the
          // gap of the session INTERVAL — a cross-batch straggler
          // earlier than the stored start extends the session BACKWARD
          // (a naive `e.ts - end <= gap` test is true for every earlier
          // event and would silently absorb hours-older stragglers
          // without moving t_start, diverging from the batch sessionizer)
          case Some(s) if eUs >= micros(s.start) - gapUs &&
              eUs - micros(s.end) <= gapUs =>
            val start = if (eUs < micros(s.start)) e.ts else s.start
            val end = if (eUs > micros(s.end)) e.ts else s.end
            cur = Some(SessionAcc(start, end, s.n + 1, s.sum + e.value))
          // straggler more than a gap BEFORE the open session: it is
          // its own already-closed session (the gap to s.start closes
          // it); emit immediately, keep the open session
          case Some(s) if eUs < micros(s.start) =>
            out += SessionOut(userId, e.ts, e.ts, 1L, e.value)
          case Some(s) =>
            close(s)
            cur = Some(SessionAcc(e.ts, e.ts, 1L, e.value))
          case None =>
            cur = Some(SessionAcc(e.ts, e.ts, 1L, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // round the microsecond end UP to ms — truncation would let the
        // state time out just before the gap boundary and split a
        // boundary event into a spurious new session
        state.setTimeoutTimestamp((micros(s.end) + 999L) / 1000L + gapMs)
      }
    }
    out.iterator
  }
}
