package graft.etl

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}

/** Recurring-job runner — the library-embedded equivalent of the
  * reference's scheduled Databricks job (README: the ETL notebook runs
  * on a daily jobs-service trigger; here the schedule ships WITH the
  * pipeline so a plain `spark-submit` long-runner can host it).
  *
  * Semantics:
  *  - fixed-DELAY scheduling: the next run starts `interval` after the
  *    previous one FINISHES — runs never overlap, a slow run simply
  *    delays the next (the jobs-service "max concurrent runs = 1"
  *    default, and the only safe default for a pipeline whose commits
  *    are snapshot-dependent);
  *  - failure backoff: after a failed run the wait doubles (capped at
  *    `maxBackoff`), resetting on the next success — a broken upstream
  *    API degrades to a slow probe instead of a hot error loop;
  *  - `maxConsecutiveFailures` stops the schedule entirely (the
  *    circuit breaker; `Handle.state` reports why);
  *  - every run is recorded (id, start, duration, outcome) in a
  *    bounded in-memory history — the audit trail a jobs UI shows.
  *
  * Driver-side by design, one daemon thread per schedule: scheduling
  * work is not distributed work — the JOB body runs Spark plans.
  */
object Scheduler {

  final case class RunRecord(runId: Long, startedAtMs: Long,
      durationMs: Long, outcome: Either[Throwable, String])

  sealed trait State
  case object Running extends State
  case object Stopped extends State
  /** The circuit breaker opened: `failures` consecutive failures. */
  final case class Failed(failures: Int) extends State

  final class Handle private[Scheduler] (
      stopFlag: AtomicBoolean,
      thread: Thread,
      records: ConcurrentLinkedQueue[RunRecord],
      stateRef: java.util.concurrent.atomic.AtomicReference[State],
      ran: AtomicLong,
      waiters: ConcurrentLinkedQueue[(Long, CountDownLatch)]) {

    /** Stop after the in-flight run (if any) completes. */
    def stop(): Unit = {
      stopFlag.set(true)
      thread.interrupt()
      thread.join(30000)
      if (stateRef.get() == Running) stateRef.set(Stopped)
    }

    def state: State = stateRef.get()

    /** Completed run records, oldest first. */
    def history: Seq[RunRecord] = {
      val it = records.iterator()
      val b = Seq.newBuilder[RunRecord]
      while (it.hasNext) b += it.next()
      b.result()
    }

    /** Block until at least `n` runs completed (or timeout; returns
      * whether the count was reached) — the spec/ops wait primitive.
      */
    def awaitRuns(n: Long, timeoutMs: Long): Boolean = {
      if (ran.get() >= n) return true
      // a QUEUE of waiters, not a single slot: two concurrent callers
      // must each get their own latch (a clobbered waiter would block
      // for its full timeout even after its target was reached)
      val latch = new CountDownLatch(1)
      waiters.add((n, latch))
      if (ran.get() >= n) { waiters.remove((n, latch)); return true }
      val ok = latch.await(timeoutMs, TimeUnit.MILLISECONDS) || ran.get() >= n
      waiters.remove((n, latch)) // fired or timed out — never left stale
      ok
    }
  }

  /** Start a schedule running `job` every `intervalMs` (fixed delay).
    * `job` receives the run id and returns a summary string recorded
    * in the history; a thrown exception records a failure. `firstDelayMs`
    * defaults to one interval (a just-deployed daily job shouldn't fire
    * at deploy time); pass 0 for run-immediately.
    */
  def every(intervalMs: Long,
      maxConsecutiveFailures: Int = 3,
      maxBackoffMs: Long = 60 * 60 * 1000L,
      firstDelayMs: Long = -1L,
      historyLimit: Int = 1000)(job: Long => String): Handle = {
    require(intervalMs > 0, "interval must be positive")
    val stopFlag = new AtomicBoolean(false)
    val records = new ConcurrentLinkedQueue[RunRecord]()
    val stateRef = new java.util.concurrent.atomic.AtomicReference[State](Running)
    val ran = new AtomicLong(0)
    val waiters = new ConcurrentLinkedQueue[(Long, CountDownLatch)]()
    val thread = new Thread(() => {
      var consecutiveFailures = 0
      var wait = if (firstDelayMs >= 0) firstDelayMs else intervalMs
      var runId = 0L
      while (!stopFlag.get()) {
        try {
          if (wait > 0) Thread.sleep(wait)
        } catch { case _: InterruptedException => () }
        if (!stopFlag.get()) {
          val t0 = System.currentTimeMillis()
          val outcome =
            try Right(job(runId))
            catch {
              case e: InterruptedException => throw e
              case e: Throwable => Left(e)
            }
          records.add(RunRecord(runId, t0,
            System.currentTimeMillis() - t0, outcome))
          while (records.size() > historyLimit) records.poll()
          runId += 1
          val n = ran.incrementAndGet()
          // fire and drop EVERY satisfied waiter
          val it = waiters.iterator()
          while (it.hasNext) {
            val (target, latch) = it.next()
            if (n >= target) { latch.countDown(); it.remove() }
          }
          outcome match {
            case Right(_) =>
              consecutiveFailures = 0
              wait = intervalMs
            case Left(_) =>
              consecutiveFailures += 1
              if (consecutiveFailures >= maxConsecutiveFailures) {
                stateRef.set(Failed(consecutiveFailures))
                stopFlag.set(true)
              } else {
                // doubled interval per consecutive failure, capped
                wait = math.min(
                  intervalMs * (1L << math.min(consecutiveFailures, 30)),
                  maxBackoffMs)
              }
          }
        }
      }
      if (stateRef.get() == Running) stateRef.set(Stopped)
    }, s"graft-scheduler-${System.identityHashCode(records)}")
    thread.setDaemon(true)
    thread.start()
    new Handle(stopFlag, thread, records, stateRef, ran, waiters)
  }
}
