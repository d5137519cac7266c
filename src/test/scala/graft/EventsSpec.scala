package graft

import graft.queries.Events
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {

  /** Epoch millis of a timestamp column that may surface as
    * java.sql.Timestamp (TIMESTAMP) or java.time.LocalDateTime
    * (TIMESTAMP_NTZ — what the generator's timestamp-micros parquet
    * reads as); the session zone is pinned UTC, so NTZ wall-clock IS
    * the epoch.
    */
  private def tsMillis(r: org.apache.spark.sql.Row, field: String): Long =
    r.getAs[Any](field) match {
      case t: java.sql.Timestamp => t.getTime
      case d: java.time.LocalDateTime =>
        d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      case other => sys.error(s"unexpected $field type: ${other.getClass}")
    }

  test("tumbling windows partition all events") {
    val rows = Events.tumbling(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.events(spark, sf).count())
  }

  test("sessionize: gap property holds within, boundaries exceed gap") {
    val sessions = Events.sessionize(spark, sf).collect()
    assert(sessions.nonEmpty)
    sessions.foreach { r =>
      assert(tsMillis(r, "t_start") <= tsMillis(r, "t_end"))
      assert(r.getAs[Long]("n_events") > 0)
    }
    // per user: session ids dense from 1, start of next session > end
    // of previous by more than the 30-min gap
    sessions.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("session_id"))
      assert(sorted.map(_.getAs[Long]("session_id")).toSeq ==
        (1L to sorted.length))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val gap = tsMillis(b, "t_start") - tsMillis(a, "t_end")
          assert(gap > 30 * 60000L, s"inter-session gap $gap ms")
        case _ =>
      }
    }
  }

  test("session_window: partitions all events into non-overlapping gap sessions") {
    import spark.implicits._
    val rows = Events.sessionWindow(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      Tables.events(spark, sf).count())
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(tsMillis(_, "t_start"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // merged session windows are separated by at least the gap:
          // next start >= previous end (end already includes +30 min)
          assert(tsMillis(b, "t_start") >= tsMillis(a, "t_end"))
        case _ =>
      }
    }
    // same session count as the gaps-and-islands formulation (the two
    // differ only on a gap of exactly 30:00, absent in the data)
    assert(rows.length == Events.sessionize(spark, sf).count())
  }

  test("gap_fill: dense per-user calendar, zero-filled, LOCF total-preserving") {
    import spark.implicits._
    val rows = Events.gapFill(spark, sf).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rs) =>
      val days = rs.map(_.getAs[java.sql.Date]("d").toLocalDate).sorted
      // no holes: every day between the user's first and last is present
      assert(days.length ==
        java.time.temporal.ChronoUnit.DAYS.between(days.head, days.last) + 1)
      // LOCF never null (first day always has activity by construction)
      rs.foreach(r => assert(!r.isNullAt(r.fieldIndex("locf_value"))))
    }
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      Tables.events(spark, sf).count())
  }

  test("transition matrix: bigram total = events - users") {
    import spark.implicits._
    val rows = Events.transitionMatrix(spark, sf).collect()
    val ev = Tables.events(spark, sf)
    assert(rows.map(_.getAs[Long]("n")).sum ==
      ev.count() - ev.select($"user_id").distinct().count())
  }

  test("outliers: matches driver-side 2-sigma recomputation") {
    import spark.implicits._
    val got = Events.outliers(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_outliers"))
      .toMap
    val raw = Tables.events(spark, sf)
      .select($"event_type", $"value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val want = raw.groupBy(_._1).flatMap { case (t, vs) =>
      val xs = vs.map(x => BigDecimal(x._2).setScale(2).toDouble)
      val n = xs.length
      val mean = xs.map(BigDecimal(_)).sum.toDouble / n
      val m2 = xs.map(x => BigDecimal(x) * BigDecimal(x)).sum.toDouble
      val sd = math.sqrt((m2 - n * mean * mean) / (n - 1))
      val k = vs.count(x => math.abs(x._2 - mean) > 2 * sd).toLong
      if (k > 0) Some(t -> k) else None
    }
    assert(got == want)
  }

  test("user stats: conditional counts sum to total") {
    val rows = Events.userStats(spark, sf).collect()
    rows.foreach { r =>
      val parts = Seq("n_click", "n_view", "n_purchase", "n_signup", "n_error")
        .map(r.getAs[Long]).sum
      assert(parts == r.getAs[Long]("n_events"))
    }
  }

  test("pivot: row sums match daily totals") {
    val rows = Events.pivotDaily(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(r =>
      Seq("click", "view", "purchase", "signup", "error")
        .map(r.getAs[Long]).sum).sum
    assert(total == Tables.events(spark, sf).count())
  }

  test("MAD outliers: matches a driver replay of the cents-exact rule") {
    val vals = Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> math.round(r.getDouble(1) * 100))
      .groupBy(_._1).view.mapValues(_.map(_._2.toDouble).sorted).toMap
    def medInterp(s: Seq[Double]): Double = {
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }
    val rows = Events.madOutliers(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_outliers"),
          r.getAs[Double]("median_v"), r.getAs[Double]("mad_v"))).toMap
    assert(rows.keySet == vals.keySet)
    vals.foreach { case (t, cs) =>
      val med = medInterp(cs)
      val devs = cs.map(c => math.abs(c - med)).sorted
      val mad = medInterp(devs)
      val want = (cs.size.toLong, devs.count(_ > mad * 4.4478).toLong,
        med / 100.0, mad / 100.0)
      assert(rows(t) == want, s"$t: got ${rows(t)}, want $want")
    }
    // the rule actually fires somewhere on the synthetic values
    assert(rows.values.exists(_._2 > 0))
  }

  test("MAD outliers: wide value domains route medians through the KLL sketch with bounded rank error") {
    import spark.implicits._
    // 300k rows, all-distinct cents — past the sketch capacity (2^17)
    // so compaction actually happens, and past the forced domain bound
    // so the sketch path (not exact percentile) runs
    val n = 300000
    val ev = spark.range(n.toLong)
      .select(lit("wide").as("event_type"), col("id").as("event_id"),
        col("id").as("cents"))
    val sketch = Events.madOutliersOn(ev, exactDomainBound = 1000)
      .collect().head
    val exact = Events.madOutliersOn(ev) // 300k distinct < default bound
      .collect().head
    assert(sketch.getAs[Long]("n") == n.toLong)
    // true median of 0..n-1 = (n-1)/2; KLL rank error over 300k items
    // at capacity 2^17 is well under 1% — allow 1% of n in value terms
    // (values are uniform, so rank error ≡ value error here)
    val trueMed = (n - 1) / 2.0 / 100.0
    assert(math.abs(sketch.getAs[Double]("median_v") - trueMed) <= n * 0.01 / 100.0,
      s"sketch median ${sketch.getAs[Double]("median_v")} vs true $trueMed")
    assert(math.abs(exact.getAs[Double]("median_v") - trueMed) < 1e-9,
      "exact path must stay exact below the domain bound")
    // MAD of uniform 0..n-1 is ~n/4 — same 1% rank tolerance
    val trueMad = n / 4.0 / 100.0
    assert(math.abs(sketch.getAs[Double]("mad_v") - trueMad) <= n * 0.01 / 100.0)
  }

  test("sketchSetops: a high-cardinality segment column fails loudly instead of OOMing the driver") {
    import spark.implicits._
    val ev = spark.range(5000)
      .select(concat(lit("seg_"), col("id")).as("event_type"),
        (col("id") % 97).as("user_id"))
    val e = intercept[IllegalArgumentException](
      Events.sketchSetopsOn(ev, maxTypes = 100).collect())
    assert(e.getMessage.contains("more than 100 distinct segment"))
    assert(e.getMessage.contains("high-cardinality"))
  }
}
