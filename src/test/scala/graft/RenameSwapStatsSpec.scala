package graft

import graft.etl.DeltaLite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import java.nio.file.Files

/** Physical-id-stamped stats labels vs the rename ALIAS SWAP.
  *
  * The hazard (pre-stamp rule): entries record the stats column by
  * LOGICAL name. After `k→j` then `a→k`, an entry recorded
  * `key_col = "k"` describes the OLD k's bytes, yet a name match
  * re-validates it for the NEW k (physically the old a) — a range-
  * disjoint file would be WRONGLY PRUNED, silently dropping matches
  * from upsert/DELETE/readIndexed. The physstats rev stamps the
  * stable PHYSICAL id next to every recorded name (key_phys /
  * extra_phys in parquet entries, statsPhys / 4th cols field in JSON
  * records); both prune layers (the driver fold's fileRange and the
  * entries-parquet DF translation in DeltaLiteScan.pruneCondition)
  * match stamped labels by that id, so a swap can never re-validate
  * a stale range — and a SINGLE rename no longer disables pruning.
  */
class RenameSwapStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

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

  /** k ascending 0..399 in tight per-file ranges; a = k + 10000 so the
    * two columns' value ranges can NEVER overlap — any prune decision
    * that applies old-k ranges to new-k (old a) values is detectable.
    */
  private def mkSwapped(root: String,
      checkpoint: Boolean): DeltaLite = {
    val t = DeltaLite(spark, root, "k")
    t.appendClustered((0L until 400L).map(k => (k, k + 10000L, s"v$k"))
      .toDF("k", "a", "v"), numFiles = 8)
    if (checkpoint) t.checkpointNow()
    t.renameColumn("k", "j")
    t.renameColumn("a", "k")
    t
  }

  private def swapChecks(t: DeltaLite): Unit = {
    // the OLD k's ranges stay live for the NEW name of those bytes:
    // a point filter on j still plans ~1 file (stamps are phys-stable)
    // — checked FIRST, while the originally-written files are live
    val qj = t.readIndexed().filter(col("j") === 42L)
    assert(qj.collect().map(_.getString(2)).toSeq == Seq("v42"))
    val total = t.liveFiles().size
    val planned = scanOf(qj).metrics("numFiles").value
    assert(planned < total,
      s"stamped range stopped pruning through the rename: $planned/$total")
    // NEW k is physically the old a: every value lives in [10000,10400)
    // while the stale labels say [0,400). A name match would prune all.
    // readIndexed must still find the rows…
    val q = t.readIndexed().filter(col("k") === 10005L)
    assert(q.collect().map(_.getString(2)).toSeq == Seq("v5"),
      "swap re-validated stale stats: point lookup on new k lost its row")
    // …and an upsert on the new k must REWRITE, not wrongly insert a
    // duplicate next to the surviving old row (no range applies to the
    // swapped key, so the rewrite is table-wide — conservative; a
    // restats on the new key re-arms pruning)
    t.upsert(Seq((7L, 10007L, "UP")).toDF("j", "k", "v"), "k")
    val got = t.read().filter(col("k") === 10007L).collect()
    assert(got.length == 1 && got.head.getString(2) == "UP",
      s"upsert on swapped key mispruned: ${got.mkString(", ")}")
    // DELETE on the new k must remove the row, not no-op past it
    t.deleteWhere(col("k") === 10005L)
    assert(t.read().filter(col("k") === 10005L).count() == 0,
      "deleteWhere on swapped key mispruned")
  }

  test("alias swap never re-validates stale labels (inline-record log)") {
    swapChecks(mkSwapped(tmp("graft-swap-inline"), checkpoint = false))
  }

  test("alias swap never re-validates stale labels (checkpointed, lazy DF prune)") {
    swapChecks(mkSwapped(tmp("graft-swap-ckpt"), checkpoint = true))
  }

  test("multi-column extra stamps keep pruning on the swapped name's own bytes") {
    val t = DeltaLite(spark, tmp("graft-swap-extra"), "k")
    // both columns ascend together so BOTH carry tight per-file ranges
    t.appendClustered((0L until 400L).map(k => (k, k + 10000L, s"v$k"))
      .toDF("k", "a", "v"), numFiles = 8)
    assert(t.restats(Seq("k", "a")).isDefined)
    t.checkpointNow()
    t.renameColumn("k", "j")
    t.renameColumn("a", "k")
    val total = t.liveFiles().size
    // new k (old a): its extra range was stamped with old a's physical
    // id, so the point filter prunes via the RIGHT bytes
    val q = t.readIndexed().filter(col("k") === 10321L)
    assert(q.collect().map(_.getString(2)).toSeq == Seq("v321"))
    assert(scanOf(q).metrics("numFiles").value == 1,
      "stamped extra range should prune the swapped name by physical id")
  }

  test("pre-rev logs read compatibly: name rule until restats re-stamps") {
    val root = tmp("graft-swap-legacy")
    val t = DeltaLite(spark, root, "k")
    t.appendClustered((0L until 400L).map(k => (k, k + 10000L, s"v$k"))
      .toDF("k", "a", "v"), numFiles = 8)
    // simulate a pre-physstats writer: strip the stamp fields from the
    // published record (record-level statsPhys; per-file 4th cols field
    // is absent here — no extras were recorded)
    val logFile = new java.io.File(root, "_log/0.json")
    val body = new String(
      java.nio.file.Files.readAllBytes(logFile.toPath), "UTF-8")
    assert(body.contains("\"statsPhys\":\"k\""), "writer should stamp")
    java.nio.file.Files.write(logFile.toPath,
      body.replace("\"statsPhys\":\"k\",", "").getBytes("UTF-8"))
    val t2 = DeltaLite(spark, root, "k")
    // legacy rule still prunes by name pre-rename
    val q = t2.readIndexed().filter(col("k") === 123L)
    assert(q.collect().map(_.getString(2)).toSeq == Seq("v123"))
    assert(scanOf(q).metrics("numFiles").value == 1, "legacy name-rule prune")
    // single rename → conservatively inert (pre-rev behavior), correct
    t2.renameColumn("k", "j")
    val qj = t2.readIndexed().filter(col("j") === 123L)
    assert(qj.collect().map(_.getString(2)).toSeq == Seq("v123"))
    // a fresh analyze re-stamps: pruning re-arms under the new name
    val t3 = DeltaLite(spark, root, "j")
    assert(t3.restats("j").isDefined)
    val qr = t3.readIndexed().filter(col("j") === 123L)
    qr.collect()
    assert(scanOf(qr).metrics("numFiles").value == 1,
      "restats should re-arm stamped pruning after a rename")
  }
}
