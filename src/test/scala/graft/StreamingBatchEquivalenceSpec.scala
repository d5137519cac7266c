package graft

import graft.streaming.{Event, EventsStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** The streaming sessionizer must agree with the batch gaps-and-islands
  * query on the same data — the incremental and re-run expressions of
  * one semantic.
  */
class StreamingBatchEquivalenceSpec extends SparkSpec {

  test("streaming sessionize == batch sessionize on the sf0.001 events") {
    import spark.implicits._
    val events = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().sortBy(_.ts.getTime)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventsStream.sessionize(input.toDS(), gapMinutes = 30,
      watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess_equiv")
      .outputMode("append").start()
    try {
      input.addData(events.toIndexedSeq)
      query.processAllAvailable()
      // sentinel far past every session's (end + gap) advances the
      // watermark so all open sessions time out and emit
      val flushTs = new Timestamp(events.map(_.ts.getTime).max + 4 * 3600 * 1000L)
      input.addData(Event(-1L, flushTs, -1L, "sentinel", 0.0))
      query.processAllAvailable()
      input.addData(Event(-2L, new Timestamp(flushTs.getTime + 4 * 3600 * 1000L),
        -1L, "sentinel", 0.0))
      query.processAllAvailable()

      val streamed = spark.table("sess_equiv").collect()
        .filter(_.getAs[Long]("user_id") >= 0)
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("t_start"),
          r.getAs[Timestamp]("t_end"), r.getAs[Long]("n_events")))
        .toSet
      val batch = queries.Events.sessionize(spark, sf).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("t_start"),
          r.getAs[Timestamp]("t_end"), r.getAs[Long]("n_events")))
        .toSet
      assert(streamed == batch,
        s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)} " +
          s"(sizes: streamed=${streamed.size} batch=${batch.size})")
    } finally query.stop()
  }

  test("streaming session_window == batch session_window on sf0.001 events") {
    import spark.implicits._
    val events = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().sortBy(_.ts.getTime)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventsStream.sessionWindowAgg(input.toDS().toDF(),
      gapMinutes = 30, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sw_equiv")
      .outputMode("append").start()
    try {
      input.addData(events.toIndexedSeq)
      query.processAllAvailable()
      val flushTs = new Timestamp(events.map(_.ts.getTime).max + 4 * 3600 * 1000L)
      input.addData(Event(-1L, flushTs, -1L, "sentinel", 0.0))
      query.processAllAvailable()
      input.addData(Event(-2L, new Timestamp(flushTs.getTime + 4 * 3600 * 1000L),
        -1L, "sentinel", 0.0))
      query.processAllAvailable()

      val streamed = spark.table("sw_equiv").collect()
        .filter(_.getAs[Long]("user_id") >= 0)
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("t_start"),
          r.getAs[Timestamp]("t_end"), r.getAs[Long]("n_events")))
        .toSet
      val batch = queries.Events.sessionWindow(spark, sf).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("t_start"),
          r.getAs[Timestamp]("t_end"), r.getAs[Long]("n_events")))
        .toSet
      assert(streamed == batch,
        s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)} " +
          s"(sizes: streamed=${streamed.size} batch=${batch.size})")
    } finally query.stop()
  }
}
