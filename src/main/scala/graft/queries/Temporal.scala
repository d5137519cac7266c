package graft.queries

import graft.Tables
import graft.ops.TemporalJoins
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Temporal-join queries (SURVEY.md §2c): as-of and range joins over
  * the events/orders tables, built on [[graft.ops.TemporalJoins]].
  */
object Temporal {

  /** As-of join: each event picks up the latest order (by order date,
    * then order key) that the same customer placed at or before the
    * event time — the point-in-time-enrichment every feature pipeline
    * runs. Union–window plan: one shuffle on the key.
    */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TemporalJoins.asofJoin(
      left = Tables.events(s, dir).select($"event_id", $"user_id", $"ts"),
      right = Tables.orders(s, dir),
      leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate",
      payload = Seq("o_orderkey", "o_totalprice"),
      tieBreak = "o_orderkey")
      .select($"event_id", $"user_id",
        $"asof_o_orderkey".as("asof_orderkey"),
        $"asof_o_totalprice".as("asof_totalprice"))
      .orderBy($"event_id")
  }

  /** Range join: events land in 3-day promo windows (10 deterministic
    * intervals tiling the event month) via the bucketed interval join —
    * equality on the day bucket plus a residual range filter, never a
    * nested-loop.
    */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val day = 86400L
    val base = to_timestamp(lit("2024-01-01 00:00:00"))
    val intervals = s.range(10).select($"id".as("interval_id"),
      (unix_timestamp(base) + $"id" * 3 * day).as("lo"),
      (unix_timestamp(base) + ($"id" * 3 + 2) * day).as("hi"))
    val points = Tables.events(s, dir)
      .select($"event_id", $"value", unix_timestamp($"ts").as("p"))
    TemporalJoins.pointInInterval(points, "p", intervals, "lo", "hi",
      bucket = day)
      .groupBy($"interval_id")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast(DecimalType(12, 2))).cast("double").as("sum_value"))
      .orderBy($"interval_id")
  }

  /** Batch last-touch attribution — the BATCH twin of the streaming
    * interval join ([[graft.streaming.EventsStream.clickAttribution]],
    * whose spec asserts equivalence to exactly this shape): each
    * purchase takes the latest click by the same user in the preceding
    * hour, or nulls. The horizon bound keeps the per-user join fan-out
    * finite (a user's purchases × their in-horizon clicks), and the
    * argmax collapses it with one struct-max aggregate — no window
    * sort over the joined blowup.
    */
  def qAttribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("click_ts"), $"event_id".as("click_id"))
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("purchase_ts"),
        $"event_id".as("purchase_id"), $"value".as("amount"))
    val best = purchases.join(clicks, Seq("user_id"))
      .filter($"click_ts" <= $"purchase_ts" &&
        $"click_ts" >= $"purchase_ts" - expr("INTERVAL 60 MINUTES"))
      .groupBy($"purchase_id")
      .agg(max(struct($"click_ts", $"click_id")).as("b"))
      .select($"purchase_id", $"b.click_id".as("click_id"),
        $"b.click_ts".as("click_ts"))
    purchases.join(best, Seq("purchase_id"), "left")
      .select($"user_id", $"purchase_id", $"amount", $"click_id", $"click_ts")
      .orderBy($"purchase_id")
  }
}
