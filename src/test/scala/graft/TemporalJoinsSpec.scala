package graft

import graft.ops.TemporalJoins
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkSpec {

  test("asof join: latest at-or-before row per key, deterministic ties, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // key 10, t=100
      (2L, 10L, 205L),
      (3L, 20L, 50L),  // before any right row for key 20
      (4L, 30L, 100L)  // key with no right rows at all
    ).toDF("event_id", "k", "t")
    val right = Seq(
      (10L, 100L, 11L, 1.0), // exactly AT left t=100 — counts (≤)
      (10L, 100L, 12L, 2.0), // same time: larger key wins the tie
      (10L, 200L, 13L, 3.0),
      (20L, 60L, 21L, 4.0)
    ).toDF("k", "t", "okey", "amount")
    val got = TemporalJoins.asofJoin(left, right,
        leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "t",
        payload = Seq("okey", "amount"), tieBreak = "okey")
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)), Option(r.get(4))))
    assert(got(0) == ((1L, Some(12L), Some(2.0)))) // tie at t=100 → okey 12
    assert(got(1) == ((2L, Some(13L), Some(3.0)))) // latest ≤ 205
    assert(got(2) == ((3L, None, None)))           // right row is later
    assert(got(3) == ((4L, None, None)))           // no right rows
  }

  test("asof join with tolerance nulls out stale matches") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (2L, 10L, 300L)).toDF("event_id", "k", "t")
    val right = Seq((10L, 90L, 11L)).toDF("k", "t", "okey")
    val got = TemporalJoins.asofJoin(left, right,
        "k", "k", "t", "t", Seq("okey"), tieBreak = "okey",
        tolerance = Some(lit(50L)))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), Option(r.get(3))))
    // t=100: match at 90 is within 50 back; t=300: 90 is stale
    assert(got(0) == ((1L, Some(11L))))
    assert(got(1) == ((2L, None)))
  }

  test("asof join matches the brute-force definition on real tables") {
    import spark.implicits._
    val events = Tables.events(spark, sf).select($"event_id", $"user_id", $"ts")
      .limit(500)
    val orders = Tables.orders(spark, sf)
    val got = TemporalJoins.asofJoin(events, orders,
        "user_id", "o_custkey", "ts", "o_orderdate",
        Seq("o_orderkey"), tieBreak = "o_orderkey")
      .select($"event_id", $"asof_o_orderkey")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // brute force: rank candidates per event, take the top
    val brute = events.join(orders,
        $"o_custkey" === $"user_id" && $"o_orderdate" <= $"ts", "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"event_id")
          .orderBy($"o_orderdate".desc_nulls_last, $"o_orderkey".desc_nulls_last)))
      .filter($"rn" === 1)
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Any]("o_orderkey"))).toMap
    assert(got.size == brute.size)
    assert(got == brute)
  }

  test("range join: boundary semantics and multi-bucket intervals vs brute force") {
    import spark.implicits._
    val intervals = Seq(
      (0L, 100L, 110L),  // within one bucket (width 50)
      (1L, 100L, 260L),  // spans 4 buckets
      (2L, 250L, 300L)   // overlaps interval 1
    ).toDF("iid", "lo", "hi")
    val points = (90L to 310L by 5L).toDF("p").withColumn("pid", col("p"))
    val got = TemporalJoins.pointInInterval(points, "p", intervals,
        "lo", "hi", bucket = 50L)
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = points.crossJoin(intervals)
      .filter($"p" >= $"lo" && $"p" < $"hi")
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute)
    // lo inclusive, hi exclusive
    assert(got.contains((100L, 0L)) && !got.contains((110L, 0L)))
    // a point in the overlap pairs with both intervals exactly once each
    val overlap = TemporalJoins.pointInInterval(points, "p", intervals,
        "lo", "hi", bucket = 50L)
      .filter($"pid" === 255L).select($"iid")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(overlap == Seq(1L, 2L))
  }

  test("asof join plans one shuffle, no join operator at all") {
    val df = graft.queries.Temporal.qAsofJoin(spark, sf)
    df.collect()
    // AQE prints "Final Plan" then "Initial Plan" — audit the final only
    val plan = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==").head
    // the union-window formulation: no join node, and the only
    // exchanges are the key shuffle + the final presentation sort
    assert(!plan.contains("Join"), plan)
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected <=2 exchanges (key + final sort):\n$plan")
  }

  test("edge cases: empty right side; negative-value range buckets") {
    import spark.implicits._
    // as-of with no right rows at all: every left row keeps null payload
    val left = Seq((1L, 5L, 100L)).toDF("event_id", "k", "t")
    val right = Seq.empty[(Long, Long, Long)].toDF("k", "t", "okey")
    val r = TemporalJoins.asofJoin(left, right, "k", "k", "t", "t",
      Seq("okey"), tieBreak = "okey").collect()
    assert(r.length == 1 && r(0).isNullAt(3))
    // negative coordinates: floor-division bucketing must stay correct
    val iv = Seq((0L, -120L, -20L), (1L, -50L, 60L)).toDF("iid", "lo", "hi")
    val pts = (-130L to 70L by 10L).toDF("p").withColumn("pid", col("p"))
    val got = TemporalJoins.pointInInterval(pts, "p", iv, "lo", "hi", 50L)
      .select($"pid", $"iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val brute = pts.crossJoin(iv).filter($"p" >= $"lo" && $"p" < $"hi")
      .select($"pid", $"iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == brute)
  }

  test("range join plans as an equality join on the bucket, not a nested loop") {
    val df = graft.queries.Temporal.qRangeJoin(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("HashJoin"), plan) // broadcast or shuffled, on __b
  }
}
