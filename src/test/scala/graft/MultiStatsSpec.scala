package graft

import graft.etl.DeltaLite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import java.nio.file.Files

/** Multi-column file statistics (Delta's per-column stats): one
  * ANALYZE pass records [min,max] for SEVERAL columns per file; the
  * commit-log FileIndex then skips files on a filter over ANY analyzed
  * column — multi-dimensional pruning without a Z-order rewrite when
  * the data is already naturally clustered per column.
  */
class MultiStatsSpec extends SparkSpec {
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

  /** k ascending, day descending across files — each column clusters
    * on its own axis, so single-column stats could never serve both.
    */
  private def mkTable(root: String): DeltaLite = {
    val t = DeltaLite(spark, root, "k")
    t.appendClustered((0L until 400L).map(k => (k, 400L - k, s"v$k"))
      .toDF("k", "day", "v"), numFiles = 8)
    t
  }

  test("one analyze pass records ranges for several columns; filters on each prune") {
    val t = mkTable(tmp("graft-mstats"))
    assert(t.restats(Seq("k", "day")).isDefined)
    val total = t.liveFiles().size
    def planned(filter: org.apache.spark.sql.Column): Long = {
      val q = t.readIndexed().filter(filter)
      q.collect()
      scanOf(q).metrics("numFiles").value
    }
    assert(planned($"k" === 257L) == 1, "primary key point lookup")
    assert(planned($"day" === 143L) == 1, "secondary column point lookup")
    val ranged = planned($"day" >= 100L && $"day" < 150L)
    assert(ranged < total && ranged >= 1, s"day range planned $ranged of $total")
    // un-analyzed column never prunes
    assert(planned($"v" === "v7") == total)
    // results still correct under pruning
    assert(t.readIndexed().filter($"day" === 143L).collect()
      .map(_.getLong(0)).toSeq == Seq(257L))
  }

  test("declared statsColumns record per-column ranges AT WRITE TIME — no analyze needed") {
    val root = tmp("graft-mstats-auto")
    val t = new DeltaLite(spark, root, Some("k"),
      statsColumns = Seq("day"))
    t.appendClustered((0L until 400L).map(k => (k, 400L - k, s"v$k"))
      .toDF("k", "day", "v"), numFiles = 8)
    val q = t.readIndexed().filter($"day" === 143L)
    q.collect()
    assert(scanOf(q).metrics("numFiles").value == 1,
      "write-time day ranges must prune without restats")
    // both the primary key and the extra column prune
    val qk = t.readIndexed().filter($"k" === 257L)
    qk.collect()
    assert(scanOf(qk).metrics("numFiles").value == 1)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(257L))
  }

  test("extra ranges survive the commit-log round trip, checkpoints and clone") {
    val root = tmp("graft-mstats-rt")
    val t = mkTable(root)
    t.restats(Seq("k", "day"))
    // fresh instance parses the log from disk
    val t2 = DeltaLite(spark, root, "k")
    val q = t2.readIndexed().filter($"day" === 143L)
    q.collect()
    assert(scanOf(q).metrics("numFiles").value == 1)
    // checkpoint + trim: ranges ride the checkpoint's file entries
    t2.checkpointNow(); t2.cleanLog()
    val t3 = DeltaLite(spark, root, "k")
    val q3 = t3.readIndexed().filter($"day" === 143L)
    q3.collect()
    assert(scanOf(q3).metrics("numFiles").value == 1)
    // shallow clone carries them too
    val c = t3.shallowCloneTo(tmp("graft-mstats-clone"))
    val qc = c.readIndexed().filter($"day" === 143L)
    qc.collect()
    assert(scanOf(qc).metrics("numFiles").value == 1)
  }

  test("rewrites drop extra ranges conservatively; re-analyze restores them") {
    val t = mkTable(tmp("graft-mstats-rw"))
    t.restats(Seq("k", "day"))
    t.compact(targetBytes = 1L << 30, minFiles = 2) // everything into one rewrite
    // rewritten files carry no day ranges: day filters keep all files
    val q = t.readIndexed().filter($"day" === 143L)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(257L))
    // post-compact everything is one file; add a second batch in a
    // DISJOINT day range so re-analyzed pruning is observable
    t.appendClustered((400L until 800L).map(k => (k, 1600L - k, s"v$k"))
      .toDF("k", "day", "v"), numFiles = 8)
    t.restats(Seq("k", "day"))
    val q2 = t.readIndexed().filter($"day" === 1100L) // k=500, batch 2 only
    q2.collect()
    assert(scanOf(q2).metrics("numFiles").value < t.liveFiles().size,
      "re-analyze must restore day pruning")
    assert(q2.collect().map(_.getLong(0)).toSeq == Seq(500L))
  }
}
