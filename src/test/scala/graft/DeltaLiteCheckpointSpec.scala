package graft

import graft.etl.DeltaLite
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Commit-log checkpointing: the publish path persists the replayed
  * state every `checkpointInterval` commits, so a table open parses
  * O(interval) log files instead of O(versions) — the economics that
  * keep a long-lived streaming sink's table cheap to open at any age.
  * `cleanLog` trims records below the checkpoint (Delta's log
  * retention); everything below then fails EXPLICITLY, never silently.
  */
class DeltaLiteCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def batch(lo: Long, n: Int): org.apache.spark.sql.DataFrame =
    (lo until lo + n).map(k => (k, s"v$k")).toDF("k", "v")

  private def logFiles(root: String): Seq[String] = {
    val d = new java.io.File(root, "_log")
    Option(d.list()).map(_.toSeq.sorted).getOrElse(Nil)
  }

  test("a checkpoint is written every interval and bounds open cost to O(interval) parses") {
    val root = tmp("graft-ckpt")
    val t = DeltaLite(spark, root, "k")
    (0 until 25).foreach(i => t.append(batch(i * 10L, 10)))   // v0..v24
    val names = logFiles(root)
    assert(names.contains("10.checkpoint.meta.json") &&
      names.contains("20.checkpoint.meta.json") &&
      names.contains("10.checkpoint.entries") &&
      names.contains("20.checkpoint.entries"),
      s"expected v2 interval checkpoints at v10 and v20, got $names")
    // a FRESH open (new parse cache) replays checkpoint + tail only
    val t2 = DeltaLite(spark, root, "k")
    assert(t2.read().count() == 250)
    assert(t2.latestVersion.contains(24))
    val parses = t2.logParses.get()
    // 1 checkpoint + commits 21..24 = 5 files, not 25
    assert(parses <= DeltaLite.DefaultCheckpointInterval + 1,
      s"open parsed $parses log files — checkpoint not bounding open cost")
  }

  test("time travel below the checkpoint serves from real records while they exist") {
    val root = tmp("graft-ckpt-tt")
    val t = DeltaLite(spark, root, "k")
    (0 until 12).foreach(i => t.append(batch(i * 10L, 10)))   // cp at v10
    assert(logFiles(root).contains("10.checkpoint.meta.json"))
    assert(t.readAsOf(3).count() == 40)    // below cp: raw replay
    assert(t.readAsOf(10).count() == 110)  // at cp
    assert(t.readAsOf(11).count() == 120)  // above cp
  }

  test("cleanLog trims the prefix; state, time travel above, and explicit failure below") {
    val root = tmp("graft-ckpt-clean")
    val t = DeltaLite(spark, root, "k")
    (0 until 23).foreach(i => t.append(batch(i * 10L, 10)))   // cps at 10, 20
    val removed = t.cleanLog()
    assert(removed.nonEmpty)
    val names = logFiles(root)
    // strictly-below-20 records and the superseded v10 checkpoint gone;
    // 20.json itself stays (history/timestamp anchor)
    assert(!names.contains("0.json") && !names.contains("19.json") &&
      !names.contains("10.checkpoint.meta.json") &&
      !names.contains("10.checkpoint.entries"))
    assert(names.contains("20.json") && names.contains("20.checkpoint.meta.json") &&
      names.contains("20.checkpoint.entries"))
    // fresh open: full current state, travel at/above cp fine
    val t2 = DeltaLite(spark, root, "k")
    assert(t2.read().count() == 230)
    assert(t2.readAsOf(20).count() == 210)
    assert(t2.readAsOf(22).count() == 230)
    // below cp: records are gone — explicit error, not a wrong table
    val e = intercept[IllegalStateException](t2.readAsOf(5).collect())
    assert(e.getMessage.contains("checkpoint"))
    // change feed below the trim fails explicitly too
    intercept[IllegalArgumentException](t2.changesBetween(2, 22))
    // …but the tail above the checkpoint still feeds
    assert(t2.changesBetween(20, 22).count() == 20)
    // appends continue normally after a trim
    t2.append(batch(1000L, 10))
    assert(t2.read().count() == 240)
  }

  test("a truncated log with no checkpoint fails fast instead of replaying a partial history") {
    val root = tmp("graft-ckpt-trunc")
    val t = new DeltaLite(spark, root, Some("k"), checkpointInterval = 0)
    (0 until 3).foreach(i => t.append(batch(i * 10L, 10)))
    assert(new java.io.File(root, "_log/0.json").delete())
    val t2 = new DeltaLite(spark, root, Some("k"), checkpointInterval = 0)
    val e = intercept[IllegalStateException](t2.read())
    assert(e.getMessage.contains("truncated"))
  }

  test("a hole in the middle of the log fails fast") {
    val root = tmp("graft-ckpt-hole")
    val t = new DeltaLite(spark, root, Some("k"), checkpointInterval = 0)
    (0 until 5).foreach(i => t.append(batch(i * 10L, 10)))
    assert(new java.io.File(root, "_log/2.json").delete())
    val t2 = new DeltaLite(spark, root, Some("k"), checkpointInterval = 0)
    val e = intercept[IllegalStateException](t2.read())
    assert(e.getMessage.contains("hole"))
  }

  test("txn high-water marks survive the checkpoint splice and cleanLog") {
    val root = tmp("graft-ckpt-txn")
    val t = DeltaLite(spark, root, "k")
    assert(t.txnAppend(batch(0, 5), "job-a", txnId = 7L).isDefined) // v0
    (0 until 11).foreach(i => t.append(batch(100L + i * 10, 10)))   // past cp v10
    t.checkpointNow()
    t.cleanLog()
    val t2 = DeltaLite(spark, root, "k")
    // the marker committed at v0 lives only in the checkpoint now —
    // a replayed batch must still be skipped (no double-append)
    assert(t2.lastTxn("job-a").contains(7L))
    assert(t2.txnAppend(batch(0, 5), "job-a", txnId = 7L).isEmpty)
    assert(t2.read().count() == 115)
    assert(t2.txnAppend(batch(500L, 5), "job-a", txnId = 8L).isDefined)
    assert(t2.read().count() == 120)
  }

  test("column mapping, constraints and deletion vectors ride the checkpoint") {
    val root = tmp("graft-ckpt-meta")
    val t = DeltaLite(spark, root, "k")
    t.append(batch(0, 20))                       // v0
    t.renameColumn("v", "w")                     // v1 metadata-only
    t.addCheckConstraint("k_nonneg", "k >= 0")   // v2
    t.deleteWhere(col("k") >= 15L)               // v3: DV sidecar
    (0 until 9).foreach(i => t.append(           // v4..v12, cp at v10
      (100L + i * 10 until 100L + i * 10 + 10).map(k => (k, s"v$k")).toDF("k", "w")))
    t.checkpointNow()
    t.cleanLog()
    val t2 = DeltaLite(spark, root, "k")
    val out = t2.read()
    assert(out.schema.fieldNames.toSeq == Seq("k", "w"))      // rename held
    assert(out.filter(col("k") >= 15L && col("k") < 100L).count() == 0) // DVs held
    assert(out.count() == 105)
    // the constraint replays from the checkpoint: a violating batch
    // must still be rejected with nothing committed
    val before = t2.latestVersion
    intercept[IllegalStateException](
      t2.append(Seq((-1L, "bad")).toDF("k", "w")))
    assert(t2.latestVersion == before)
  }

  test("v2: metadata-only opens never load the entries parquet (bounded-memory open)") {
    val root = tmp("graft-ckpt-lazy")
    val t = DeltaLite(spark, root, "k")
    (0 until 12).foreach(i => t.append(batch(i * 10L, 10)))   // cp at v10
    assert(logFiles(root).contains("10.checkpoint.meta.json"))
    val t2 = DeltaLite(spark, root, "k")
    // schema / version / properties / constraint surface replay the
    // small meta only — O(live files) entry state must stay on disk
    assert(t2.schema.exists(_.fieldNames.sameElements(Array("k", "v"))))
    assert(t2.latestVersion.contains(11))
    assert(t2.tableProperties.isEmpty)
    assert(t2.entryLoads.get() == 0,
      "metadata-only open materialized the checkpoint's file entries")
    // the first actual scan forces exactly one entries load
    assert(t2.read().count() == 120)
    assert(t2.entryLoads.get() == 1)
    assert(t2.read().count() == 120)
    assert(t2.entryLoads.get() == 1, "entries must load at most once per instance")
  }

  test("v2: entries write is multi-part parquet and round-trips stats/extra/sizes") {
    val root = tmp("graft-ckpt-parts")
    // tiny per-part budget: 25 one-file appends → >1 part file, the
    // million-file layout at fixture scale
    val t = new DeltaLite(spark, root, Some("k")) {
      override protected def entriesPerPart: Int = 8
    }
    (0 until 12).foreach(i => t.append(batch(i * 10L, 10)))   // cp at v10
    val entries = new java.io.File(root, "_log/10.checkpoint.entries")
    assert(entries.isDirectory)
    val parts = entries.list().count(_.endsWith(".parquet"))
    assert(parts > 1, s"expected a multi-part entries dir, got $parts part(s)")
    // fresh open replays from the spliced parquet checkpoint: row set,
    // per-file stats (min/max pruning input) and sizes all survive
    val t2 = DeltaLite(spark, root, "k")
    assert(t2.read().count() == 120)
    assert(t2.readAsOf(10).count() == 110)
  }

  test("v2: append-tail checkpoints flow checkpoint→checkpoint without driver-materializing the prior live set") {
    val root = tmp("graft-ckpt-incr")
    val t = DeltaLite(spark, root, "k")
    (0 until 11).foreach(i => t.append(batch(i * 10L, 10)))   // cp v10 (driver fold: no base)
    // fresh instance: the v10 base is only ever a lazy parquet handle
    val t2 = DeltaLite(spark, root, "k")
    (0 until 10).foreach(i => t2.append(batch(1000L + i * 10, 10))) // v11..v20 → cp v20
    assert(logFiles(root).contains("20.checkpoint.meta.json"))
    assert(t2.entryLoads.get() == 0,
      "append-tail checkpoint must not load the prior entry set on the driver")
    // the incrementally-built checkpoint replays to the exact state
    t2.cleanLog()
    val t3 = DeltaLite(spark, root, "k")
    assert(t3.read().count() == 210)
    assert(t3.readAsOf(20).count() == 210)
  }

  test("v2: a delete in the append tail rides the incremental checkpoint (DV rows flow)") {
    val root = tmp("graft-ckpt-incr-dv")
    val t = DeltaLite(spark, root, "k")
    (0 until 11).foreach(i => t.append(batch(i * 10L, 10)))   // cp v10
    t.deleteWhere(col("k") === 5L)                            // v11: DV sidecar
    (0 until 9).foreach(i => t.append(batch(2000L + i * 10, 10))) // v12..v20 → incremental cp
    t.cleanLog()
    val t2 = DeltaLite(spark, root, "k")
    assert(t2.read().count() == 199)
    assert(t2.read().filter(col("k") === 5L).count() == 0,
      "the DV-deleted row resurrected through the incremental checkpoint")
    // a REWRITING tail also flows incrementally: the compaction's
    // removes anti-join the base on the precomputed pathn column —
    // the checkpoint itself must not re-materialize the base (the
    // compact's own scan is the only entry load on this instance)
    t2.compact(minFiles = 2)
    val loadsAfterCompact = t2.entryLoads.get()
    t2.checkpointNow()
    assert(t2.entryLoads.get() == loadsAfterCompact,
      "rewrite-tail checkpoint re-materialized the base entry set")
    t2.cleanLog()
    val t3 = DeltaLite(spark, root, "k")
    assert(t3.read().count() == 199)
    assert(t3.read().filter(col("k") === 5L).count() == 0)
    // and the compacted-away files are really gone from the checkpoint
    assert(t3.liveFiles().size < 12,
      s"removes did not apply through the incremental path: ${t3.liveFiles().size} files")
  }

  test("v2: a 100k-file table checkpoints and re-opens without driver-materializing the live set") {
    val root = tmp("graft-ckpt-many")
    val t = DeltaLite(spark, root, "k")
    t.append(batch(0, 5)) // v0: real files anchor the schema
    // adopt 100k (fake-path) file entries in one epoch — the shape of a
    // long-lived streaming table; nothing ever scans them here, this
    // pins the METADATA economics at the million-file order
    val many = (0 until 100000).map(i => (s"$root/v=epoch/part-$i.parquet", 1024L))
    assert(t.adoptStreamEpoch(many, overwrite = false, "epoch-load", 1L).contains(1))
    assert(t.checkpointNow().contains(1))
    val entries = new java.io.File(root, "_log/1.checkpoint.entries")
    assert(entries.isDirectory)
    // a FRESH open answers metadata queries with ZERO entry loads —
    // the O(live files) state stays on disk
    val t2 = DeltaLite(spark, root, "k")
    assert(t2.latestVersion.contains(1))
    assert(t2.schema.exists(_.fieldNames.sameElements(Array("k", "v"))))
    assert(t2.entryLoads.get() == 0,
      "metadata-only open of a 100k-file table materialized the live set")
    // …and the NEXT checkpoint flows incrementally: prev parquet → new
    // parquet as a Spark job, still zero driver materialization
    assert(t2.adoptStreamEpoch(Seq((s"$root/v=epoch2/part-0.parquet", 1024L)),
      overwrite = false, "epoch-load", 2L).contains(2))
    assert(t2.checkpointNow().contains(2))
    assert(t2.entryLoads.get() == 0,
      "the append-tail checkpoint of a 100k-file table hit the driver fold")
    // the incrementally-written checkpoint carries the whole live set
    val reopened = spark.read
      .parquet(s"$root/_log/2.checkpoint.entries")
    assert(reopened.filter("kind = 'f'").count() >= 100001L)
  }

  test("v2: an overwrite in the tail short-circuits — the checkpoint never reads the base at all") {
    val root = tmp("graft-ckpt-reset")
    val t = DeltaLite(spark, root, "k")
    (0 until 11).foreach(i => t.append(batch(i * 10L, 10)))   // cp v10
    val t2 = DeltaLite(spark, root, "k")
    t2.overwrite(batch(5000L, 20))                            // v11: snapshot reset
    (0 until 9).foreach(i => t2.append(batch(6000L + i * 10, 10))) // v12..v20 → cp v20
    assert(logFiles(root).contains("20.checkpoint.meta.json"))
    // the reset makes the v10 base irrelevant — zero entry loads AND
    // zero base-parquet reads back the claim that the live set is
    // entirely tail-derived
    assert(t2.entryLoads.get() == 0,
      "a reset tail must not read the previous checkpoint's entries")
    t2.cleanLog()
    val t3 = DeltaLite(spark, root, "k")
    assert(t3.read().count() == 110)
    assert(t3.read().filter(col("k") < 5000L).count() == 0,
      "pre-overwrite rows leaked through the reset-tail checkpoint")
  }

  test("legacy json checkpoints read back under the parquet-default build; mixed logs dedup to v2") {
    val root = tmp("graft-ckpt-legacy")
    val legacy = new DeltaLite(spark, root, Some("k"), checkpointFormat = "json")
    (0 until 12).foreach(i => legacy.append(batch(i * 10L, 10))) // cp v10 as single blob
    assert(logFiles(root).contains("10.checkpoint.json") &&
      !logFiles(root).contains("10.checkpoint.meta.json"))
    // a parquet-default build opens the legacy checkpoint unchanged
    val t2 = DeltaLite(spark, root, "k")
    assert(t2.read().count() == 120)
    assert(t2.readAsOf(10).count() == 110)
    val parses = t2.logParses.get()
    assert(parses <= DeltaLite.DefaultCheckpointInterval + 1,
      s"legacy checkpoint no longer bounds the open: $parses parses")
    // …and its next interval writes v2 alongside; both formats at one
    // version must dedup (v2 preferred), not double-replay
    (0 until 9).foreach(i => t2.append(batch(1000L + i * 10, 10))) // v12..v20
    val names = logFiles(root)
    assert(names.contains("20.checkpoint.meta.json"))
    t2.checkpointNow() // no-op: already checkpointed at latest
    val t3 = DeltaLite(spark, root, "k")
    assert(t3.read().count() == 210)
    // cleanLog under mixed formats trims the legacy blob below v20
    t3.cleanLog()
    assert(!logFiles(root).contains("10.checkpoint.json"))
    assert(DeltaLite(spark, root, "k").read().count() == 210)
  }

  test("checkpointNow is idempotent and concurrent-safe by construction") {
    val root = tmp("graft-ckpt-idem")
    val t = DeltaLite(spark, root, "k")
    (0 until 3).foreach(i => t.append(batch(i * 10L, 10)))
    assert(t.checkpointNow().contains(2))
    val once = logFiles(root)
    assert(t.checkpointNow().contains(2))      // no-op: already present
    assert(logFiles(root) == once)
    assert(t.cleanLog().size == 2)             // 0.json, 1.json
    assert(DeltaLite(spark, root, "k").read().count() == 30)
  }
}
