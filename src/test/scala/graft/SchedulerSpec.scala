package graft

import graft.etl._
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** The recurring-job runner: fixed-delay cadence, no overlap, failure
  * backoff + circuit breaker, stop semantics, and the full composition
  * a scheduled reference job runs (extract → land → load on a cadence).
  */
class SchedulerSpec extends SparkSpec {

  test("runs on the cadence, records history, stop halts cleanly") {
    val runs = new AtomicInteger(0)
    val h = Scheduler.every(intervalMs = 20, firstDelayMs = 0) { id =>
      runs.incrementAndGet(); s"run $id ok"
    }
    assert(h.awaitRuns(3, timeoutMs = 5000), "3 runs within 5s")
    h.stop()
    val after = h.history.size
    assert(after >= 3)
    assert(h.state == Scheduler.Stopped)
    Thread.sleep(100)
    assert(h.history.size == after, "no runs after stop")
    // ids increment from 0; all succeeded with the returned summary
    val recs = h.history
    assert(recs.map(_.runId) == recs.indices.map(_.toLong))
    assert(recs.forall(_.outcome.isRight))
    assert(recs.head.outcome == Right("run 0 ok"))
  }

  test("runs never overlap: a slow run delays the next (fixed delay)") {
    val inFlight = new AtomicInteger(0)
    val overlapped = new AtomicInteger(0)
    val h = Scheduler.every(intervalMs = 5, firstDelayMs = 0) { _ =>
      if (inFlight.incrementAndGet() > 1) overlapped.incrementAndGet()
      Thread.sleep(30)
      inFlight.decrementAndGet()
      "ok"
    }
    assert(h.awaitRuns(3, timeoutMs = 5000))
    h.stop()
    assert(overlapped.get() == 0, "no concurrent runs")
  }

  test("consecutive failures back off then open the circuit breaker") {
    val h = Scheduler.every(intervalMs = 10, maxConsecutiveFailures = 3,
      firstDelayMs = 0) { _ => sys.error("boom") }
    assert(h.awaitRuns(3, timeoutMs = 5000), "3 failing runs")
    // breaker opened at 3 consecutive failures; no further runs
    Thread.sleep(150)
    assert(h.history.size == 3)
    assert(h.state == Scheduler.Failed(3))
    assert(h.history.forall(_.outcome.isLeft))
    // failure waits doubled: run1→run2 gap ≥ 2×interval (loose check —
    // timer granularity makes exact bounds flaky)
    val starts = h.history.map(_.startedAtMs)
    assert(starts(2) - starts(1) >= starts(1) - starts(0),
      "backoff must not shrink the gap")
  }

  test("a success resets the failure backoff") {
    val n = new AtomicInteger(0)
    val h = Scheduler.every(intervalMs = 10, maxConsecutiveFailures = 3,
      firstDelayMs = 0) { _ =>
      if (n.incrementAndGet() == 1) sys.error("transient") else "recovered"
    }
    assert(h.awaitRuns(4, timeoutMs = 5000))
    h.stop()
    val recs = h.history
    assert(recs.head.outcome.isLeft && recs.tail.forall(_.outcome.isRight))
    assert(h.state == Scheduler.Stopped, "one transient failure never opens the breaker")
  }

  test("scheduled pipeline: the reference's recurring extract→land→load job") {
    import spark.implicits._
    val payloads = Iterator.from(0).map(i =>
      s"""{"items":[{"id":{"videoId":"v$i"},"snippet":{"title":"t$i"}}]}""")
    val root = Files.createTempDirectory("graft-sched-tbl").toString
    val table = DeltaLite(spark, root)
    val pipeline = new Pipeline(spark,
      () => payloads.synchronized(payloads.next()),
      Files.createTempDirectory("graft-sched-raw").toString,
      df => JsonIngest.flatten(df)
        .select(col("items_id_videoId").as("video_id"),
          col("items_snippet_title").as("title")),
      table, dedupKey = "video_id")
    val h = Scheduler.every(intervalMs = 30, firstDelayMs = 0) { id =>
      val (_, v) = pipeline.run(s"batch$id"); s"v$v"
    }
    assert(h.awaitRuns(2, timeoutMs = 30000))
    h.stop()
    val n = h.history.size
    // each run landed one new video; dedup-append accumulated them all
    assert(table.read().count() == n.toLong)
    assert(table.read().select("video_id").as[String].collect().toSet ==
      (0 until n).map(i => s"v$i").toSet)
  }

  test("two concurrent awaitRuns waiters both fire (no latch clobbering)") {
    val h = Scheduler.every(intervalMs = 20, firstDelayMs = 0)(_ => "ok")
    try {
      import java.util.concurrent.{CountDownLatch, TimeUnit}
      val done = new CountDownLatch(2)
      val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
      // the second registration used to overwrite the first waiter's
      // latch, leaving it blocked for its full timeout
      val threads = Seq(2L, 4L).map { target =>
        val t = new Thread(() => {
          results.add(h.awaitRuns(target, timeoutMs = 20000))
          done.countDown()
        })
        t.start(); t
      }
      assert(done.await(25, TimeUnit.SECONDS), "both waiters must return")
      threads.foreach(_.join(1000))
      assert(results.size == 2 && !results.contains(false))
    } finally h.stop()
  }
}
