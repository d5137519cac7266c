package graft

import graft.etl.DeltaLite
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

/** Optimistic concurrency: racing writers serialize through the
  * version log — appends commute (losers re-target the next version),
  * snapshot-dependent commits fail loudly instead of losing the
  * concurrent writer's update, and nothing is ever dropped or
  * double-committed.
  */
class ConcurrencySpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("racing appends all land: dense versions, no lost rows") {
    import spark.implicits._
    val root = tmp("graft-occ")
    val seedT = DeltaLite(spark, root, "k")
    seedT.append(Seq((-1L, -1L)).toDF("k", "w"))

    val nThreads = 6
    val perThread = 4
    val pool = Executors.newFixedThreadPool(nThreads)
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until nThreads).foreach { tid =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          // each writer gets its OWN table handle (fresh log cache)
          val t = DeltaLite(spark, root, "k")
          try (0 until perThread).foreach { i =>
            val k = (tid * perThread + i).toLong
            t.append(Seq((k, k * 100)).toDF("k", "w"))
          } catch { case e: Throwable => errs.add(e) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "writers timed out")
    assert(errs.isEmpty, s"no append may fail: ${Option(errs.peek())}")

    val t = DeltaLite(spark, root, "k")
    // every row landed exactly once
    val got = t.read().select("k").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (-1L until (nThreads * perThread).toLong).toSeq)
    // versions are dense 0..N with one commit each, all appends
    val latest = t.latestVersion.get
    assert(latest == nThreads * perThread)
    (0 to latest).foreach { v =>
      assert(t.commitInfo(v)._1 == "append")
    }
  }

  test("interval checkpoints written under writer races stay consistent") {
    import spark.implicits._
    val root = tmp("graft-occ-ckpt")
    val seedT = new DeltaLite(spark, root, Some("k"), checkpointInterval = 5)
    seedT.append(Seq((-1L, -1L)).toDF("k", "w"))
    val nThreads = 4
    val perThread = 5
    val pool = Executors.newFixedThreadPool(nThreads)
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until nThreads).foreach { tid =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          val t = new DeltaLite(spark, root, Some("k"), checkpointInterval = 5)
          try (0 until perThread).foreach { i =>
            val k = (tid * perThread + i).toLong
            t.append(Seq((k, k * 100)).toDF("k", "w"))
          } catch { case e: Throwable => errs.add(e) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "writers timed out")
    assert(errs.isEmpty, s"no append may fail: ${Option(errs.peek())}")
    // the racing writers crossed several interval boundaries — losers
    // of a checkpoint rename discard their temp, winners publish; the
    // surviving checkpoints must replay to the SAME state the raw log
    // does, and a cold open must be bounded by them
    val names = new java.io.File(root, "_log").list().toSeq
    assert(names.count(_.endsWith(".checkpoint.meta.json")) >= 2,
      s"interval checkpoints missing under race: $names")
    val t = new DeltaLite(spark, root, Some("k"), checkpointInterval = 5)
    val got = t.read().select("k").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (-1L until (nThreads * perThread).toLong).toSeq)
    assert(t.logParses.get() <= 5 + 1,
      s"cold open parsed ${t.logParses.get()} files despite checkpoints")
    // trimming behind the newest checkpoint keeps the state identical
    t.checkpointNow(); t.cleanLog()
    val t2 = new DeltaLite(spark, root, Some("k"), checkpointInterval = 5)
    assert(t2.read().count() == nThreads * perThread + 1)
    assert(t2.lastTxn("nope").isEmpty)
  }

  test("a snapshot-dependent commit computed against a stale snapshot fails, never loses the concurrent write") {
    import spark.implicits._
    val root = tmp("graft-occ-stale")
    val t = DeltaLite(spark, root, "k")
    t.append((1L to 100L).map(k => (k, k)).toDF("k", "w"))

    // interleave: a slow upsert starts, then a fast append lands
    // mid-flight. Either the upsert happened to publish first (both
    // commits present) or it lost the race and must have thrown —
    // in NO case may the append's rows vanish.
    val pool = Executors.newFixedThreadPool(1)
    val upsertResult = pool.submit(new java.util.concurrent.Callable[Option[Throwable]] {
      override def call(): Option[Throwable] = {
        val w = DeltaLite(spark, root, "k")
        try { w.upsert((1L to 100L).map(k => (k, k * 2)).toDF("k", "w"), "k"); None }
        catch { case e: Throwable => Some(e) }
      }
    })
    Thread.sleep(150) // let the upsert's read/join/write get going
    val appender = DeltaLite(spark, root, "k")
    val appendOk =
      try { appender.append(Seq((999L, 999L)).toDF("k", "w")); true }
      catch { case _: java.util.ConcurrentModificationException => false }
    pool.shutdown()
    val upErr = upsertResult.get(120, TimeUnit.SECONDS)

    val reader = DeltaLite(spark, root, "k")
    val keys = reader.read().select("k").collect().map(_.getLong(0)).toSet
    (upErr, appendOk) match {
      case (None, true) =>
        // both committed (serialized cleanly) — everything visible
        assert(keys == (1L to 100L).toSet + 999L)
      case (Some(e), true) =>
        // upsert lost the race and failed loudly
        assert(e.isInstanceOf[java.util.ConcurrentModificationException],
          s"unexpected failure: $e")
        assert(keys == (1L to 100L).toSet + 999L)
        assert(reader.read().filter(col("k") === 1L).head().getLong(1) == 1L,
          "failed upsert must leave the table untouched")
      case (None, false) =>
        // append lost (upsert published first and the append saw a
        // state change? appends retry on same-state, so this means
        // the append's base check tripped) — rows must still be sane
        assert(keys == (1L to 100L).toSet)
      case (Some(e), false) =>
        fail(s"both writers failed: $e")
    }
  }

  test("append auto-retry refuses a concurrent schema change") {
    import spark.implicits._
    val root = tmp("graft-occ-schema")
    val t = DeltaLite(spark, root)
    t.append(Seq((1L, "a")).toDF("k", "v"))
    // writer A prepares an append, writer B renames a column first;
    // deterministic interleave via direct calls: B's rename lands,
    // then A (whose handle cached nothing — enforceSchema reads fresh)
    // appends under the OLD name and must fail schema enforcement
    val a = DeltaLite(spark, root)
    t.renameColumn("v", "txt")
    intercept[IllegalArgumentException] {
      a.append(Seq((2L, "b")).toDF("k", "v"))
    }
    // and under the new name it lands
    a.append(Seq((2L, "b")).toDF("k", "txt"))
    assert(DeltaLite(spark, root).read().count() == 2)
  }

  test("vacuumOrphans sweeps unreferenced attempt dirs but never live or fresh ones") {
    import spark.implicits._
    val root = tmp("graft-occ-orphan")
    val t = DeltaLite(spark, root, "k")
    t.append(Seq((1L, 1L)).toDF("k", "w"))
    // fabricate a crash orphan: a data dir with a parquet file no
    // commit references
    val orphanDir = new java.io.File(root, "v=9-deadbeef")
    Seq((99L, 99L)).toDF("k", "w").write.parquet(orphanDir.toString)
    // too fresh: the age guard protects it
    assert(t.vacuumOrphans(olderThanMs = 60000).isEmpty)
    // old enough: swept
    val swept = t.vacuumOrphans(olderThanMs = -1)
    assert(swept.exists(_.contains("v=9-deadbeef")))
    assert(!orphanDir.exists())
    // live data untouched
    assert(t.read().count() == 1)
    assert(t.vacuumOrphans(olderThanMs = -1).isEmpty,
      "live dirs must never be swept")
  }

  test("vacuumOrphans never sweeps a PARTITIONED table's live commits") {
    import spark.implicits._
    val root = tmp("graft-occ-orphan-part")
    val t = new DeltaLite(spark, root, partitionBy = Seq("p"))
    // committed partitioned data: part files nest under __p_<id>=<v>
    // subdirectories, so the attempt dir's immediate children are
    // directories — a shallow listing would misread it as an orphan
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "p"))
    t.append(Seq((3L, "a")).toDF("k", "p"))
    assert(t.vacuumOrphans(olderThanMs = -1).isEmpty,
      "partitioned live dirs must never be swept")
    assert(t.read().count() == 3)
    // a genuinely orphaned partitioned attempt IS swept
    val orphanDir = new java.io.File(root, "v=9-cafebabe")
    Seq((99L, "z")).toDF("k", "p").write
      .partitionBy("p").parquet(orphanDir.toString)
    val swept = t.vacuumOrphans(olderThanMs = -1)
    assert(swept.exists(_.contains("v=9-cafebabe")))
    assert(!orphanDir.exists())
    assert(t.read().count() == 3)
  }

  test("concurrent SQL DML: OCC surfaces, no update is silently lost") {
    graft.catalog.GraftCatalog.install(spark,
      Files.createTempDirectory("graft-occ-wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.occ")
    spark.sql("CREATE TABLE graft.occ.t (k BIGINT, n BIGINT)")
    spark.sql("INSERT INTO graft.occ.t VALUES (1, 0), (2, 0), (3, 0)")
    // racing row-level updates: rewrite commits are snapshot-dependent,
    // so of two simultaneous UPDATEs one must commit and the other
    // must FAIL (ConcurrentModificationException through the SQL
    // surface) — never a silent lost update
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val futures = (0 until 4).map { i =>
      pool.submit(new java.util.concurrent.Callable[Either[Throwable, Unit]] {
        override def call(): Either[Throwable, Unit] =
          try Right { spark.sql(
            s"UPDATE graft.occ.t SET n = n + 1 WHERE k = ${i % 3 + 1}"); () }
          catch { case e: Throwable => Left(e) }
      })
    }
    val results = futures.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    val ok = results.count(_.isRight)
    assert(ok >= 1, "at least one update must win")
    results.collect { case Left(e) =>
      assert(chain(e).exists(_.isInstanceOf[java.util.ConcurrentModificationException]),
        s"a losing update must fail with the OCC exception, got $e")
    }
    // the table reflects EXACTLY the winners: total n == committed ops
    val totalN = spark.sql("SELECT CAST(SUM(n) AS BIGINT) FROM graft.occ.t")
      .head().getLong(0)
    assert(totalN == ok.toLong,
      s"sum(n)=$totalN must equal the $ok committed updates — no loss, no double-apply")
  }

  private def chain(e: Throwable): Seq[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq
}
