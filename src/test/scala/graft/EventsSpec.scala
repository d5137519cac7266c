package graft

import graft.queries.Events
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {

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
      assert(!r.getAs[java.sql.Timestamp]("t_start")
        .after(r.getAs[java.sql.Timestamp]("t_end")))
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
          val gap = b.getAs[java.sql.Timestamp]("t_start").getTime -
            a.getAs[java.sql.Timestamp]("t_end").getTime
          assert(gap > 30 * 60000L, s"inter-session gap $gap ms")
        case _ =>
      }
    }
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
}
