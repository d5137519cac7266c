package graft

import graft.streaming.{Event, EventsStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed counts with watermark over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventsStream.windowedCounts(input.toDF(), "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0),
        Event(3, ts(31), 2, "view", 3.0))
      query.processAllAvailable()
      val rows = spark.table("win_counts").collect()
      val byType = rows.map(r => r.getAs[String]("event_type") ->
        r.getAs[Long]("n_events")).toMap
      assert(byType == Map("click" -> 2L, "view" -> 1L))
    } finally query.stop()
  }

  test("sliding windows: streamed hops equal the batch computation") {
    val events = EventsStream.readEvents(spark, sf)
    val query = EventsStream.slidingCounts(events, "1 hour", "1 hour", "15 minutes")
      .writeStream.format("memory").queryName("slide_counts")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("slide_counts")
        .select(col("window.start"), col("event_type"), col("n_events"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      val batch = Tables.events(spark, sf)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("window.start"), col("event_type"), col("n_events"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(streamed == batch)
      // every event lands in window/hop = 4 overlapping windows
      val total = streamed.toSeq.map(_._3).sum
      assert(total == Tables.events(spark, sf).count() * 4)
    } finally query.stop()
  }

  test("compacting writer: bounded file count, rows intact, replay-safe") {
    import spark.implicits._
    val t = graft.etl.DeltaLite(spark,
      java.nio.file.Files.createTempDirectory("graft-compact-sink").toString)
    val writer = graft.streaming.DeltaSink.compactingWriter(
      t, "cw", compactEvery = 3)
    (0L until 9L).foreach { id =>
      writer(Seq((id, s"b$id")).toDF("event_id", "payload"), id)
      if (id == 4) writer(Seq((4L, "b4")).toDF("event_id", "payload"), 4L) // replay
    }
    assert(t.read().count() == 9)
    assert(t.read().select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      == (0L until 9L))
    // 9 one-file appends would leave 9 live files; compaction every 3
    // batches keeps the live set small
    assert(t.liveFiles().size <= 3,
      s"live files not bounded: ${t.liveFiles().size}")
  }

  test("file-source stream over events.parquet: totals match batch") {
    val query = EventsStream.windowedCounts(
      EventsStream.readEvents(spark, sf), "1 hour", "1 day")
      .writeStream.format("memory").queryName("file_counts")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("file_counts").collect()
        .map(_.getAs[Long]("n_events")).sum
      assert(streamed == Tables.events(spark, sf).count())
    } finally query.stop()
  }

  test("delta sink: exactly-once across a simulated batch retry") {
    import spark.implicits._
    val t = graft.etl.DeltaLite(spark,
      java.nio.file.Files.createTempDirectory("graft-sink").toString)
    val writer = graft.streaming.DeltaSink.batchWriter(t, "app1",
      dedupKey = Some("event_id"))
    val b0 = Seq((1L, 1.0), (2L, 2.0)).toDF("event_id", "value")
    val b1 = Seq((2L, 2.0), (3L, 3.0)).toDF("event_id", "value")

    writer(b0, 0L)
    assert(t.read().count() == 2)
    val vAfterB0 = t.latestVersion
    // the crash-replay case: same batchId arrives again
    writer(b0, 0L)
    assert(t.latestVersion == vAfterB0, "replayed batch must not commit")
    assert(t.read().count() == 2)
    // next batch overlaps on the key — dedup-on-append drops the overlap
    writer(b1, 1L)
    assert(t.read().count() == 3)
    assert(t.lastTxn("app1").contains(1L))
    // and a late replay of an OLD batch after newer commits is also a no-op
    writer(b0, 0L)
    assert(t.read().count() == 3)

    // end state identical to the batch pipeline over the same batches
    val batchTable = graft.etl.DeltaLite(spark,
      java.nio.file.Files.createTempDirectory("graft-sink-batch").toString)
    batchTable.append(b0)
    batchTable.dedupAppend(b1, "event_id")
    val a = t.read().orderBy("event_id").collect().toSeq
    val b = batchTable.read().orderBy("event_id").collect().toSeq
    assert(a == b)
  }

  test("incremental aggregate MV: accumulates across batches, replay-safe") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val t = graft.etl.DeltaLite(spark,
      java.nio.file.Files.createTempDirectory("graft-mv").toString, "user_id")
    val aggSpec = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"),
          sum($"value".cast("decimal(12,2)")).cast("decimal(22,2)")
            .as("sum_value"))
    val writer = graft.streaming.DeltaSink.aggregateWriter(t, "mv1", "user_id",
      aggSpec, Seq(
        "n_events" -> ((a, b) => a + b),
        // re-pin the decimal: + widens (22,2)+(22,2) -> (23,2), which
        // schema enforcement would reject
        "sum_value" -> ((a, b) => (a + b).cast("decimal(22,2)"))))

    val all = Tables.events(spark, sf).select($"user_id", $"value")
    val b0 = all.filter($"user_id" % 3 === 0)
    val b1 = all.filter($"user_id" % 3 === 1)
    // a batch of NEW events that all land on existing keys — the
    // accumulate path (vs b1's new-key path)
    val b2 = all.filter($"user_id" % 3 =!= 2)
    writer(b0, 0L)
    writer(b0, 0L)            // immediate replay: must not double-count
    writer(b1, 1L)
    writer(b0, 0L)            // late replay after a newer commit: no-op
    writer(b2, 2L)            // keys from both earlier batches accumulate

    val want = b0.unionAll(b1).unionAll(b2)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(12,2)")).as("sum_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDecimal(2).doubleValue())).toSet
    val got = t.read().collect().map(r => (r.getAs[Long]("user_id"),
      r.getAs[Long]("n_events"),
      r.getAs[java.math.BigDecimal]("sum_value").doubleValue())).toSet
    assert(got == want)
  }

  test("delta sink: file-source stream lands the full events table exactly once") {
    import spark.implicits._
    val t = graft.etl.DeltaLite(spark,
      java.nio.file.Files.createTempDirectory("graft-sink-file").toString)
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-sink-ckpt").toString
    val stream = EventsStream.readEvents(spark, sf)
      .select($"event_id", $"user_id", $"value")
    val q = graft.streaming.DeltaSink.start(stream, t, "events_load",
      checkpoint, dedupKey = Some("event_id"))
    try q.processAllAvailable() finally q.stop()
    assert(t.read().count() == Tables.events(spark, sf).count())
    // restart from the same checkpoint: nothing new to process, no dupes
    val q2 = graft.streaming.DeltaSink.start(stream, t, "events_load",
      checkpoint, dedupKey = Some("event_id"))
    try q2.processAllAvailable() finally q2.stop()
    assert(t.read().count() == Tables.events(spark, sf).count())
  }

  test("streaming dedup drops replayed events across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ev(id: Long, plusMin: Int) = Event(id,
      new java.sql.Timestamp(t0.getTime + plusMin * 60000L), 1L, "click", 1.0)
    val q = EventsStream.dedupStream(in.toDF(), "event_id")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      in.addData(ev(1, 0), ev(1, 0), ev(2, 1)) // dup within batch
      q.processAllAvailable()
      // replay across batches, incl. a RE-STAMPED retry of event 2
      // (same key, shifted ts) — still a duplicate on the key contract
      in.addData(ev(2, 5), ev(3, 2))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select($"event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-static enrichment join matches the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("dim_user", "tier")
    val input = MemoryStream[Event]
    val query = EventsStream.enrich(input.toDF(), dim, "user_id", "dim_user")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 2, "view", 2.0),
        Event(3, ts(2), 9, "click", 3.0)) // no dim row → null tier
      query.processAllAvailable()
      val got = spark.table("enriched")
        .select($"event_id", $"tier").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got == Map(1L -> Some("gold"), 2L -> Some("silver"), 3L -> None))
    } finally query.stop()
  }

  test("stream-stream interval join matches the batch join exactly") {
    import spark.implicits._
    val streamed = EventsStream.clickAttribution(
      EventsStream.readEvents(spark, sf), horizonMinutes = 60)
    val q = streamed.writeStream.format("memory")
      .queryName("attribution").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("attribution")
      .select($"purchase_id", $"click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val ev = Tables.events(spark, sf)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("click_ts"),
        $"event_id".as("click_id"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("purchase_ts"),
        $"event_id".as("purchase_id"))
    val want = purchases.join(clicks,
        $"c_user" === $"p_user" && $"click_ts" <= $"purchase_ts" &&
          $"click_ts" >= $"purchase_ts" - expr("INTERVAL 60 MINUTES"))
      .select($"purchase_id", $"click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "batch reference join produced no pairs — bad fixture")
    assert(got == want)
  }

  test("transformWithState lifetime counters accumulate across batches (RocksDB)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val q = EventsStream.lifetimeStats(input.toDF())
        .writeStream.format("memory").queryName("lifetime")
        .outputMode("update").start()
      try {
        input.addData(
          Event(1, ts(0), 1, "click", 1.25),
          Event(2, ts(1), 1, "view", 2.50),
          Event(3, ts(2), 2, "click", 10.0))
        q.processAllAvailable()
        input.addData(
          Event(4, ts(3), 1, "purchase", 0.25),
          Event(5, ts(4), 3, "view", 7.75))
        q.processAllAvailable()
        // latest emission per user = lifetime totals across BOTH batches
        val latest = spark.table("lifetime").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._2) }
        assert(latest(1L) == ((1L, 3L, 400L)), s"user 1: ${latest(1L)}")
        assert(latest(2L) == ((2L, 1L, 1000L)))
        assert(latest(3L) == ((3L, 1L, 775L)))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("LEFT OUTER stream-stream join: null row only after the watermark gives up") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.clickAttributionOuter(input.toDF(),
        horizonMinutes = 60, watermark = "30 minutes")
      .writeStream.format("memory").queryName("outer_attr")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "purchase", 10.0), // matched immediately
        Event(3, ts(2), 2, "purchase", 7.0))  // no click: waits for the watermark
      q.processAllAvailable()
      val matched = spark.table("outer_attr")
        .select($"purchase_id", $"click_id").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toMap
      assert(matched == Map(2L -> Some(1L)),
        s"only the inner match may emit before the watermark: $matched")
      // far-future events on BOTH branches push the global watermark
      // past purchase 3's give-up point; they themselves stay pending
      val far = Timestamp.valueOf("2024-01-01 20:00:00")
      input.addData(
        Event(8, far, 8, "click", 1.0),
        Event(9, far, 9, "purchase", 5.0))
      q.processAllAvailable()
      val after = spark.table("outer_attr")
        .select($"purchase_id", $"click_id").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toMap
      assert(after == Map(2L -> Some(1L), 3L -> None),
        s"expired unmatched purchase must emit null-padded: $after")
      assert(!after.contains(9L), "in-horizon purchase must stay pending")
    } finally q.stop()
  }

  test("FULL OUTER stream-stream join: both sides' orphans emit after watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.clickAttributionFull(input.toDF(),
        horizonMinutes = 60, watermark = "30 minutes")
      .writeStream.format("memory").queryName("full_attr")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "purchase", 10.0), // matched pair
        Event(3, ts(2), 2, "purchase", 7.0),  // orphan purchase
        Event(4, ts(3), 3, "click", 2.0))     // orphan click
      q.processAllAvailable()
      val far = Timestamp.valueOf("2024-01-01 20:00:00")
      input.addData(
        Event(8, far, 8, "click", 1.0),
        Event(9, far, 9, "purchase", 5.0))
      q.processAllAvailable()
      val rows = spark.table("full_attr")
        .select($"user_id", $"purchase_id", $"click_id").collect()
        .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
      assert(rows.contains((1L, Some(2L), Some(1L))), s"match missing: $rows")
      assert(rows.contains((2L, Some(3L), None)),
        s"orphan purchase must null-pad: $rows")
      assert(rows.contains((3L, None, Some(4L))),
        s"orphan click must null-pad too — the full-outer half: $rows")
      assert(!rows.exists(r => r._2 == Some(9L) || r._3 == Some(8L)),
        "in-horizon rows must stay pending")
    } finally q.stop()
  }

  test("sessionize: cross-batch stragglers extend backward or emit separately") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    def ev(id: Long, user: Long, hm: String) = Event(id,
      java.sql.Timestamp.valueOf(s"2024-01-01 $hm:00"), user, "click", 1.0)
    val q = EventsStream.sessionize(in.toDS(), gapMinutes = 30,
        watermark = "2 hours")
      .writeStream.format("memory").queryName("straggler_sessions")
      .outputMode("append").start()
    try {
      in.addData(ev(1, 1, "10:00"), ev(2, 2, "10:00"))
      q.processAllAvailable()
      // user 1: straggler 10 min BEFORE the stored start, within gap →
      // session extends backward. user 2: straggler 90 min before
      // (inside the watermark horizon, beyond the gap) → its own
      // immediately-emitted single-event session.
      in.addData(ev(3, 1, "09:50"), ev(4, 2, "08:30"))
      q.processAllAvailable()
      // advance the watermark past end+gap, then once more so timeouts fire
      in.addData(ev(5, 99, "13:30"))
      q.processAllAvailable()
      in.addData(ev(6, 98, "13:31"))
      q.processAllAvailable()
      val got = spark.table("straggler_sessions")
        .select($"user_id", $"t_start", $"t_end", $"n_events")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3))).toSet
      assert(got.contains((1L, "2024-01-01 09:50:00.0", "2024-01-01 10:00:00.0", 2L)),
        s"user 1 session should extend backward, got $got")
      assert(got.contains((2L, "2024-01-01 08:30:00.0", "2024-01-01 08:30:00.0", 1L)),
        s"user 2 straggler should emit as its own session, got $got")
      assert(got.contains((2L, "2024-01-01 10:00:00.0", "2024-01-01 10:00:00.0", 1L)))
    } finally q.stop()
  }

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState MapState: per-type counts accumulate, only touched types emit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[Event]
      val q = EventsStream.typeCounts(input.toDS())
        .writeStream.format("memory").queryName("type_counts")
        .outputMode("update").start()
      try {
        input.addData(
          Event(1, ts(0), 1, "click", 0), Event(2, ts(1), 1, "click", 0),
          Event(3, ts(2), 1, "view", 0), Event(4, ts(3), 2, "view", 0))
        q.processAllAvailable()
        val b1 = spark.table("type_counts").collect()
          .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
        assert(b1 == Map((1L, "click") -> 2L, (1L, "view") -> 1L,
          (2L, "view") -> 1L), s"got $b1")
        // second batch touches only user 1's click — view must NOT re-emit
        input.addData(Event(5, ts(4), 1, "click", 0))
        q.processAllAvailable()
        val b2 = spark.table("type_counts").collect()
          .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
        assert(b2.count(_ == ((1L, "click"), 3L)) == 1,
          s"click count must continue from MapState, got ${b2.toSeq}")
        assert(b2.count(_._1 == ((1L, "view"))) == 1,
          "untouched type re-emitted")
      } finally q.stop()
    }
  }

  test("transformWithState ListState: recent history bounded to last N across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[Event]
      val q = EventsStream.recentEvents(input.toDS(), keep = 3)
        .writeStream.format("memory").queryName("recent")
        .outputMode("update").start()
      try {
        input.addData(Event(10, ts(0), 1, "click", 0),
          Event(11, ts(1), 1, "view", 0))
        q.processAllAvailable()
        input.addData(Event(12, ts(2), 1, "click", 0),
          Event(13, ts(3), 1, "view", 0), Event(14, ts(4), 1, "click", 0))
        q.processAllAvailable()
        val rows = spark.table("recent").collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1).toList))
        assert(rows.contains((1L, List(10L, 11L))), s"got ${rows.toSeq}")
        // after 5 events the list holds the LAST 3 in arrival order
        assert(rows.contains((1L, List(12L, 13L, 14L))), s"got ${rows.toSeq}")
      } finally q.stop()
    }
  }

  test("transformWithState sessionizer: timers close on gap and on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[Event]
      val q = EventsStream.sessionizeTws(input.toDS(), gapMinutes = 30,
          watermark = "0 seconds")
        .writeStream.format("memory").queryName("tws_sessions")
        .outputMode("append").start()
      try {
        input.addData(
          Event(1, ts(0), 1, "click", 1.0),
          Event(2, ts(5), 1, "view", 2.0))
        q.processAllAvailable()
        // watermark moves past 10:35 → the timer closes session 1 on
        // gap; the 10:50 event opens session 2
        input.addData(Event(3, ts(50), 1, "click", 4.0))
        q.processAllAvailable()
        // two more watermark advances: first lets the 11:20 timer
        // register against the new watermark, second fires it
        input.addData(Event(4, Timestamp.valueOf("2024-01-01 12:30:00"), 2, "view", 1.0))
        q.processAllAvailable()
        input.addData(Event(5, Timestamp.valueOf("2024-01-01 14:00:00"), 2, "view", 1.0))
        q.processAllAvailable()
        val rows = spark.table("tws_sessions").collect()
        val u1 = rows.filter(_.getAs[Long]("user_id") == 1L)
          .map(r => (r.getAs[Timestamp]("t_start"), r.getAs[Timestamp]("t_end"),
            r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
        assert(u1.contains((ts(0), ts(5), 2L, 3.0)), s"got $u1")
        assert(u1.exists(s => s._1 == ts(50) && s._3 == 1L), s"got $u1")
      } finally q.stop()
    }
  }

  test("transformWithState sessionizer: in-gap extension replaces the timer (no early close)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[Event]
      val q = EventsStream.sessionizeTws(input.toDS(), gapMinutes = 30,
          watermark = "0 seconds")
        .writeStream.format("memory").queryName("tws_extend")
        .outputMode("append").start()
      try {
        input.addData(Event(1, ts(0), 1, "click", 1.0))
        q.processAllAvailable()
        // 10:20 extends the session; the 10:30 timer from the first
        // batch is now stale and must NOT close it when the watermark
        // (10:20) + later batches pass 10:30
        input.addData(Event(2, ts(20), 1, "view", 2.0))
        q.processAllAvailable()
        // watermark to 10:40: past the STALE expiry (10:30), before the
        // live one (10:50) — nothing may emit yet
        input.addData(Event(3, ts(40), 1, "click", 4.0))
        q.processAllAvailable()
        assert(spark.table("tws_extend").isEmpty,
          "stale timer fired into an extended session")
        // push the watermark past 11:10 twice so the live timer fires
        input.addData(Event(4, ts(120), 99, "view", 0.0))
        q.processAllAvailable()
        input.addData(Event(5, ts(121), 98, "view", 0.0))
        q.processAllAvailable()
        val got = spark.table("tws_extend")
          .select($"user_id", $"t_start", $"t_end", $"n_events", $"sum_value")
          .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
        assert(got.contains((1L, ts(0), ts(40), 3L, 7.0)), s"got $got")
      } finally q.stop()
    }
  }

  test("stateful sessionization: sessions close on gap and on timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventsStream.sessionize(input.toDS(), gapMinutes = 30,
      watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session), then 40-min gap
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "view", 2.0))
      query.processAllAvailable()
      // next batch advances watermark past 10:35 → closes session on gap
      input.addData(Event(3, ts(50), 1, "click", 4.0))
      query.processAllAvailable()
      // advance event time far enough that the 10:50 session times out
      input.addData(Event(4, Timestamp.valueOf("2024-01-01 12:30:00"), 2, "view", 1.0))
      query.processAllAvailable()
      input.addData(Event(5, Timestamp.valueOf("2024-01-01 14:00:00"), 2, "view", 1.0))
      query.processAllAvailable()

      val rows = spark.table("sessions").collect()
      val u1 = rows.filter(_.getAs[Long]("user_id") == 1L)
        .map(r => (r.getAs[Timestamp]("t_start"), r.getAs[Timestamp]("t_end"),
          r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
      assert(u1.contains((ts(0), ts(5), 2L, 3.0)), s"got $u1")
      assert(u1.exists(s => s._1 == ts(50) && s._3 == 1L), s"got $u1")
    } finally query.stop()
  }
}
