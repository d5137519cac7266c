package graft

import graft.etl.DeltaLite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import java.nio.file.Files

/** Parquet-sidecar COMMIT records — the per-commit completion of the
  * v2 checkpoint story: a snapshot commit (overwrite/restore/restats)
  * of a million-file table must not render one O(live-files) JSON
  * string on the driver. Big records write their file/remove/DV sets
  * as parquet rows (distributed job) and publish a small JSON
  * reference; readers re-attach the sets lazily; replay, history,
  * cleanLog, checkpoints and feature gates all keep working. Plus the
  * round-10 checkpoint-publication hardening: completeness-checked
  * entries-dir adoption and orphan sweeping.
  */
class DeltaLiteSidecarSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def batch(lo: Long, n: Int): org.apache.spark.sql.DataFrame =
    (lo until lo + n).map(k => (k, s"v$k")).toDF("k", "v")

  private def logFiles(root: String): Seq[String] = {
    val d = new java.io.File(root, "_log")
    Option(d.list()).map(_.toSeq.sorted).getOrElse(Nil)
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.graftbridge.DeltaLiteFileIndex
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: QueryStageExec => scans(qs.plan)
    }.flatten
    scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.isInstanceOf[DeltaLiteFileIndex]).head
  }

  test("a 100k-file overwrite and restore commit with zero O(live) JSON rendering") {
    val root = tmp("graft-sidecar-big")
    val t = DeltaLite(spark, root, "k")
    t.append(batch(0, 5)) // v0: real files anchor the schema
    val rendered0 = t.jsonEntriesRendered.get()
    // v1: a 100k-file snapshot RESET (the overwrite/restore shape) —
    // entries must flow to parquet via a Spark job, never into the
    // record string
    val many = (0 until 100000).map(i => (s"$root/v=epoch/part-$i.parquet", 1024L))
    assert(t.adoptStreamEpoch(many, overwrite = true, "load", 1L).contains(1))
    assert(t.jsonEntriesRendered.get() - rendered0 < 100,
      s"the 100k-file overwrite rendered ${t.jsonEntriesRendered.get() - rendered0} " +
        "entries into JSON — the sidecar did not engage")
    val rec1 = new java.io.File(root, "_log/1.json")
    assert(rec1.length() < 16 * 1024,
      s"1.json is ${rec1.length()} bytes — an O(live files) record")
    assert(logFiles(root).exists(_.matches("1\\.[0-9a-f]{8}\\.sidecar\\.entries")),
      s"no sidecar dir for v1 in ${logFiles(root).filterNot(_.endsWith(".crc"))}")
    // metadata-only audits on a FRESH open: no entry loads, counts
    // answered from the record
    val t2 = DeltaLite(spark, root, "k")
    assert(t2.latestVersion.contains(1))
    assert(t2.history().filter(col("version") === 1)
      .select("num_added_files").head().getLong(0) == 100000L)
    assert(t2.entryLoads.get() == 0,
      "history of a sidecar-backed log materialized entry rows")
    // the gate stamp: a pre-sidecar build must refuse this log by name
    assert(t2.detail().select("reader_features").head().getString(0)
      .contains("sidecar"))
    // v2: RESTORE to v0 — 100k removes ride the sidecar as "r" rows
    val rendered1 = t2.jsonEntriesRendered.get()
    assert(t2.restore(0) == 2)
    assert(t2.jsonEntriesRendered.get() - rendered1 < 100,
      "the restore rendered its O(live) remove set into JSON")
    assert(new java.io.File(root, "_log/2.json").length() < 16 * 1024)
    // replay through the sidecar-backed records is exact
    val t3 = DeltaLite(spark, root, "k")
    assert(t3.read().collect().map(_.getLong(0)).sorted.toSeq == (0L until 5L))
  }

  test("cleanLog sweeps commit sidecars and orphaned .tmp entries dirs below the checkpoint") {
    val root = tmp("graft-sidecar-clean")
    val t = new DeltaLite(spark, root, Some("k")) {
      override protected def commitSidecarThreshold: Int = 1
    }
    (0 until 13).foreach(i => t.append(batch(i * 10L, 10))) // cp at v10
    assert(logFiles(root).contains("10.checkpoint.meta.json"))
    // plant a crashed checkpoint attempt's orphan tmp dir below the cp
    val orphan = new java.io.File(root, "_log/.tmp-3-deadbeef.entries")
    assert(orphan.mkdirs())
    val sidecarsBefore = logFiles(root)
      .filter(_.matches("\\d+\\.[0-9a-f]{8}\\.sidecar\\.entries"))
    assert(sidecarsBefore.nonEmpty, "threshold-1 appends should sidecar")
    t.cleanLog()
    val after = logFiles(root)
    assert(!after.contains(".tmp-3-deadbeef.entries"),
      "orphaned tmp entries dir survived cleanLog")
    assert(!after.exists(n => n.matches("\\d\\.[0-9a-f]{8}\\.sidecar\\.entries") &&
      n.takeWhile(_.isDigit).toInt < 10),
      s"sub-checkpoint sidecars survived: $after")
    assert(after.exists(_.matches("1[012]\\.[0-9a-f]{8}\\.sidecar\\.entries")),
      "sidecars of retained records must survive the trim")
    val t2 = DeltaLite(spark, root, "k")
    assert(t2.read().count() == 130)
    assert(t2.readAsOf(11).count() == 120)
  }

  test("checkpoint publication never adopts an incomplete entries dir") {
    val root = tmp("graft-sidecar-adopt")
    val t = new DeltaLite(spark, root, Some("k"), checkpointInterval = 0)
    (0 until 4).foreach(i => t.append(batch(i * 10L, 10))) // v0..v3
    // plant a PARTIAL pre-existing entries dir at the version about to
    // checkpoint — the shape a crashed multi-object rename leaves: a
    // plausible parquet part but no completeness marker
    val bogusDir = new org.apache.hadoop.fs.Path(root, "_log/3.checkpoint.entries")
    Seq((0L, "f", s"$root/nonexistent.parquet"))
      .toDF("idx", "kind", "path")
      .write.parquet(bogusDir.toString)
    assert(t.checkpointNow().contains(3))
    // the bogus dir was rewritten, not adopted: marker present, row
    // count matches the real live set, and the planted path is gone
    val entries = spark.read.parquet(bogusDir.toString)
    assert(entries.filter(col("path").contains("nonexistent")).count() == 0,
      "the partial pre-existing entries dir was adopted as-is")
    assert(entries.filter(col("kind") === "f").count() == t.liveFiles().size)
    assert(new java.io.File(root, "_log/3.checkpoint.entries/_graft_count").exists())
    t.cleanLog()
    val t2 = DeltaLite(spark, root, "k")
    assert(t2.read().count() == 40)
  }

  test("remove-all-keyed corner: incremental checkpoint keeps the adds' stats (driver-fold-exact)") {
    val root = tmp("graft-sidecar-corner")
    val t = DeltaLite(spark, root, "k")
    (0 until 3).foreach(i => t.append(batch(i * 10L, 10))) // v0..v2, keyed "k"
    t.checkpointNow() // v2 checkpoint, all entries key_col = k
    // a writer configured with a DIFFERENT stats key rewrites EVERY
    // base file — the tail removes all keyed-under-k entries and adds
    // entries keyed under v
    val t2 = DeltaLite(spark, root, "v")
    assert(t2.compact(minFiles = 2).contains(3))
    assert(t2.checkpointNow().contains(3))
    // the round-9 conservative corner stripped the adds' stats here;
    // the fold-exact rule keeps them: first keyed entry in fold order
    // is now a "v"-keyed add, so its stats survive — identical to what
    // the driver fold renders
    val entries = spark.read
      .parquet(s"$root/_log/3.checkpoint.entries")
      .filter(col("kind") === "f")
    assert(entries.count() >= 1)
    assert(entries.filter(col("key_col") =!= "v" ||
      col("min").isNull || col("max").isNull).count() == 0,
      "the rewrite's stats were stripped or mislabeled by the incremental writer")
    // and the checkpoint replays to the right rows
    t2.cleanLog()
    assert(DeltaLite(spark, root, "v").read().count() == 30)
  }

  test("DF-native restats: relabel join end-to-end with zero entry loads, pruning on the new stats") {
    val root = tmp("graft-sidecar-restats")
    def open() = new DeltaLite(spark, root, Some("k")) {
      override protected def commitSidecarThreshold: Int = 1
    }
    val t = open()
    (0 until 11).foreach(i => t.append(batch(i * 10L, 10))) // v0..v10, cp v10
    assert(logFiles(root).contains("10.checkpoint.meta.json"))
    // fresh instance: the analyze and the following checkpoint flow
    // entries-parquet → stats-join → sidecar → next entries-parquet
    // without EVER materializing a FileEntry on the driver
    val t2 = open()
    assert(t2.restats(Seq("k", "v")).contains(11))
    assert(t2.entryLoads.get() == 0,
      "DF-native restats materialized the live entry set")
    val rec = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "_log", "11.json")), "UTF-8")
    assert(rec.contains("\"entref\""),
      "a threshold-1 restats should publish a sidecar-backed record")
    assert(t2.checkpointNow().contains(11))
    assert(t2.entryLoads.get() == 0,
      "the restats-tail checkpoint hit the driver fold")
    // the relabel applied: the new checkpoint's entries carry the
    // analyze's stats on every file
    val entries = spark.read.parquet(s"$root/_log/11.checkpoint.entries")
      .filter(col("kind") === "f")
    assert(entries.filter(col("key_col") =!= "k" || col("min").isNull)
      .count() == 0, "restats stats did not flow through the relabel join")
    // and scan pruning works against the analyzed ranges on a fresh
    // open: a point filter plans exactly one file
    t2.cleanLog()
    val t3 = open()
    val q = t3.readIndexed().filter(col("k") === 55L)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(55L))
    assert(scanOf(q).metrics("numFiles").value == 1,
      "analyzed ranges must prune the scan to one file")
  }

  test("lazy scan pruning: a point lookup on a checkpointed table collects only surviving entries") {
    val root = tmp("graft-sidecar-lazyscan")
    val t = DeltaLite(spark, root, "k")
    // ~88 live files across 11 commits, checkpoint at v10, stats on k
    (0 until 11).foreach(i => t.append(batch(i * 100L, 80)))
    assert(logFiles(root).contains("10.checkpoint.meta.json"))
    t.cleanLog()
    val t2 = DeltaLite(spark, root, "k")
    val nLive = spark.read.parquet(s"$root/_log/10.checkpoint.entries")
      .filter(col("kind") === "f").count()
    assert(nLive > 50)
    // the point lookup: pruning predicates must run IN the entries
    // parquet read — only survivors reach the driver, the full live
    // set never materializes, and the plan scans exactly one file
    val q = t2.readIndexed().filter(col("k") === 505L)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(505L))
    assert(t2.entryLoads.get() == 0,
      "the lazily-pruned scan materialized the full entry set")
    val collected = t2.entriesCollected.get()
    assert(collected > 0 && collected <= nLive / 4,
      s"point lookup collected $collected of $nLive entries — pruning " +
        "did not push into the entries parquet")
    assert(scanOf(q).metrics("numFiles").value == 1)
    // a range filter prunes proportionally, still without a full load
    val before = t2.entriesCollected.get()
    val r = t2.readIndexed().filter(col("k") >= 1000L && col("k") < 1100L)
    assert(r.count() == 80)
    assert(t2.entryLoads.get() == 0)
    assert(t2.entriesCollected.get() - before <= nLive / 4)
    // an unfiltered scan still answers exactly (collects everything —
    // that IS the query)
    assert(t2.readIndexed().count() == 880)
  }

  test("lazy readIndexed open costs ONE action (DV paths + sizeInBytes combined), zero on repeat opens, none during query planning") {
    val root = tmp("graft-sidecar-openjobs")
    val t = DeltaLite(spark, root, "k")
    (0 until 11).foreach(i => t.append(batch(i * 100L, 80))) // cp v10
    t.cleanLog()
    // count ACTIONS (SQL executions): a single distributed aggregate
    // legitimately schedules several AQE jobs, but one action is one
    // round of driver->cluster work — that is the lazy-open currency
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case _: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          jobs.incrementAndGet(); ()
        case _ => ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      def counted[A](body: => A): (A, Int) = {
        org.apache.spark.sql.graftbridge.Bridge.waitListenerBus(spark)
        val before = jobs.get()
        val r = body
        org.apache.spark.sql.graftbridge.Bridge.waitListenerBus(spark)
        (r, jobs.get() - before)
      }
      val t2 = DeltaLite(spark, root, "k")
      // first open: the combined DV+size job, nothing else
      val (df1, openJobs) = counted(t2.readIndexed())
      assert(openJobs == 1,
        s"first lazy open launched $openJobs actions — DV paths and " +
          "sizeInBytes must ride ONE combined job")
      // repeat open at the same version: served from the snapshot cache
      val (_, reopenJobs) = counted(t2.readIndexed())
      assert(reopenJobs == 0,
        s"repeat open launched $reopenJobs actions — the snapshot cache " +
          "did not serve")
      // two same-shape point queries (different literals → each pays
      // its own prune job): equal job counts prove planning launches
      // no one-time size aggregate on the first
      val (r1, q1Jobs) = counted(
        df1.filter(col("k") === 505L).collect().toSeq)
      assert(r1.map(_.getLong(0)) == Seq(505L))
      val (r2, q2Jobs) = counted(
        df1.filter(col("k") === 606L).collect().toSeq)
      assert(r2.map(_.getLong(0)) == Seq(606L))
      assert(q1Jobs == q2Jobs,
        s"first query launched $q1Jobs actions vs $q2Jobs for the second — " +
          "a one-time side job still rides the first plan")
      assert(t2.entryLoads.get() == 0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("file-granular upsert pruning runs in the entries parquet: O(matched) driver rows") {
    val root = tmp("graft-sidecar-upsert")
    val t = DeltaLite(spark, root, "k")
    (0 until 11).foreach(i => t.append(batch(i * 100L, 80))) // cp v10
    t.cleanLog()
    val t2 = DeltaLite(spark, root, "k")
    val nLive = spark.read.parquet(s"$root/_log/10.checkpoint.entries")
      .filter(col("kind") === "f").count()
    // a point upsert: the key-range overlap prune must evaluate IN the
    // entries-parquet read — only the matched file's path reaches the
    // driver, the live FileEntry set never materializes
    t2.upsert(Seq((505L, "updated")).toDF("k", "v"), "k")
    assert(t2.entryLoads.get() == 0,
      "upsert pruning materialized the full entry set")
    val collected = t2.entriesCollected.get()
    assert(collected > 0 && collected <= nLive / 4,
      s"upsert prune collected $collected of $nLive entries")
    val got = DeltaLite(spark, root, "k").read()
      .filter(col("k") === 505L).collect()
    assert(got.length == 1 && got.head.getString(1) == "updated")
  }

  test("lazy scan pruning on a PARTITIONED checkpointed table: the path-encoded partition value prunes in the entries read") {
    val root = tmp("graft-sidecar-lazypart")
    def open() = new DeltaLite(spark, root, None,
      partitionBy = Seq("etype"))
    val t = open()
    val batchP = (0 until 60).map(i =>
      (i.toLong, if (i % 3 == 0) "click" else if (i % 3 == 1) "view" else "purchase"))
      .toDF("id", "etype")
    (0 until 11).foreach(_ => t.append(batchP)) // cp v10, hive dirs per etype
    t.cleanLog()
    val t2 = open()
    val nLive = spark.read.parquet(s"$root/_log/10.checkpoint.entries")
      .filter(col("kind") === "f").count()
    val q = t2.readIndexed().filter(col("etype") === "view")
    assert(q.count() == 220)
    assert(t2.entryLoads.get() == 0,
      "partition-filtered lazy scan materialized the full entry set")
    val collected = t2.entriesCollected.get()
    assert(collected > 0 && collected <= (nLive + 2) / 2,
      s"partition prune collected $collected of $nLive entries — the " +
        "path-value predicate did not push into the entries read")
    assert(scanOf(q).metrics("numFiles").value.toDouble <= nLive / 2.0)
  }

  test("predicate pruning for DELETE/UPDATE runs in the entries parquet") {
    val root = tmp("graft-sidecar-delup")
    val t = DeltaLite(spark, root, "k")
    (0 until 11).foreach(i => t.append(batch(i * 100L, 80))) // cp v10
    t.cleanLog()
    val nLive = spark.read.parquet(s"$root/_log/10.checkpoint.entries")
      .filter(col("kind") === "f").count()
    // a selective DELETE: the predicate's simple conjuncts prune the
    // candidate file list in the entries read — the delete scans the
    // files it can possibly touch, never the table
    val t2 = DeltaLite(spark, root, "k")
    assert(t2.deleteWhere(col("k") === 303L).isDefined)
    assert(t2.entryLoads.get() == 0,
      "deleteWhere materialized the full entry set")
    val afterDelete = t2.entriesCollected.get()
    assert(afterDelete > 0 && afterDelete <= nLive / 4,
      s"delete prune collected $afterDelete of $nLive entries")
    // a selective UPDATE through the same translation
    assert(t2.updateWhere(col("k") === 808L,
      Seq("v" -> lit("patched"))).isDefined)
    assert(t2.entryLoads.get() == 0,
      "updateWhere materialized the full entry set")
    val t3 = DeltaLite(spark, root, "k")
    assert(t3.read().filter(col("k") === 303L).count() == 0)
    val got = t3.read().filter(col("k") === 808L).collect()
    assert(got.length == 1 && got.head.getString(1) == "patched")
    assert(t3.read().count() == 879)
  }

  test("detail() and recordedStatsKey answer from one entries aggregate — no live-set materialization") {
    val root = tmp("graft-sidecar-detail")
    val t = DeltaLite(spark, root, "k")
    (0 until 11).foreach(i => t.append(batch(i * 10L, 10))) // cp v10
    t.cleanLog()
    val t2 = DeltaLite(spark, root, "k")
    val d = t2.detail().head()
    assert(d.getLong(2) > 0 && d.getLong(3) > 0) // files, bytes
    assert(t2.recordedStatsKey.contains("k"))
    assert(t2.entryLoads.get() == 0,
      "the footprint audit materialized the live entry set")
  }

  test("IN-lists and ORs prune too — lazily in the entries read and exactly in the index") {
    val root = tmp("graft-sidecar-inlist")
    val t = DeltaLite(spark, root, "k")
    (0 until 11).foreach(i => t.append(batch(i * 100L, 80))) // cp v10
    t.cleanLog()
    val t2 = DeltaLite(spark, root, "k")
    val nLive = spark.read.parquet(s"$root/_log/10.checkpoint.entries")
      .filter(col("kind") === "f").count()
    val q = t2.readIndexed().filter(col("k").isin(5L, 205L, 1005L))
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == Seq(5L, 205L, 1005L))
    assert(t2.entryLoads.get() == 0)
    assert(t2.entriesCollected.get() <= nLive / 4,
      s"IN-list collected ${t2.entriesCollected.get()} of $nLive")
    assert(scanOf(q).metrics("numFiles").value <= 3)
    // OR of two point deletes prunes the delete's candidate scan
    val before = t2.entriesCollected.get()
    assert(t2.deleteWhere(col("k") === 7L || col("k") === 1007L).isDefined)
    assert(t2.entryLoads.get() == 0)
    assert(t2.entriesCollected.get() - before <= nLive / 4)
    assert(DeltaLite(spark, root, "k").read()
      .filter(col("k").isin(7L, 1007L)).count() == 0)
  }

  test("restats on a table below the sidecar threshold publishes the classic inline record") {
    val root = tmp("graft-sidecar-restats-small")
    val t = DeltaLite(spark, root, "k")
    (0 until 3).foreach(i => t.append(batch(i * 10L, 10)))
    assert(t.restats("k").contains(3))
    val rec = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "_log", "3.json")), "UTF-8")
    assert(!rec.contains("\"entref\"") && rec.contains("\"files\":[{"),
      "a small restats should stay an inline record")
    val stats = t.liveFileStats()
    assert(stats.nonEmpty && stats.forall { case (_, mn, mx) =>
      mn.isDefined && mx.isDefined })
  }
}
