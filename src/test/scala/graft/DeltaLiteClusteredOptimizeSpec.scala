package graft

import graft.etl.DeltaLite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import java.nio.file.Files

/** Incremental clustered OPTIMIZE (round-11 item 3): after a table is
  * clustered, a plain OPTIMIZE must rewrite only the post-clustering
  * appends plus the clustered files whose recorded boxes overlap the
  * fresh data — never the whole table. Full rewrite stays reachable
  * explicitly (optimizeZOrderN); pruning correctness lives in per-file
  * stats, the cube list is only a work-scoping device.
  */
class DeltaLiteClusteredOptimizeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def batch(lo: Long, n: Int): org.apache.spark.sql.DataFrame =
    (lo until lo + n).map(k => (k, s"value-$k")).toDF("k", "v")

  private def scanFiles(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.graftbridge.DeltaLiteFileIndex
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: QueryStageExec => scans(qs.plan)
    }.flatten
    scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.isInstanceOf[DeltaLiteFileIndex])
      .head.metrics("numFiles").value
  }

  test("disjoint append: OPTIMIZE rewrites exactly the fresh files, clustered files untouched, point pruning intact") {
    val root = tmp("graft-cluster-inc")
    val t = DeltaLite(spark, root, "k")
    t.append(batch(0, 400))
    t.append(batch(400, 300))
    t.append(batch(700, 300))
    val liveBefore = t.liveFiles().size
    // first pass: full cluster into small target files so the layout
    // is multi-file and boundary logic is exercised
    val Some((v1, n1)) = t.optimizeClustered(Seq("k"), targetBytes = 4096)
    assert(n1 == liveBefore, s"first pass must cluster everything: $n1 vs $liveBefore")
    val clusteredFiles = t.liveFiles().toSet
    assert(clusteredFiles.size > 3,
      s"fixture needs a multi-file clustered layout, got ${clusteredFiles.size}")
    assert(t.tableProperties.get(DeltaLite.ClusteringColsProp).contains("k"))
    assert(t.tableProperties(DeltaLite.ClusteringCubesProp).nonEmpty)

    // a disjoint append (strictly above the clustered max)
    val av = t.append(batch(5000, 100))
    val freshCount = t.commitInfo(av)._2.size
    val Some((v2, n2)) = t.optimizeClustered(Seq("k"), targetBytes = 4096)
    assert(n2 == freshCount,
      s"disjoint fresh data must rewrite only itself: rewrote $n2 of " +
        s"$freshCount fresh (${clusteredFiles.size} clustered)")
    // every pass-1 clustered file is still live — untouched
    assert(clusteredFiles.subsetOf(t.liveFiles().toSet),
      "a clustered file disjoint from the fresh box was rewritten")
    // the optimize commit removed exactly the fresh files
    assert(t.commitInfo(v2)._3.toSet == t.commitInfo(av)._2.toSet)

    // data fidelity + point pruning in the OLD region: one file, as a
    // full rewrite would plan
    assert(t.read().count() == 1100)
    val q = t.readIndexed().filter(col("k") === 512L)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(512L))
    assert(scanFiles(q) == 1, "point query in the clustered region must plan one file")
    // and in the NEW region
    val qn = t.readIndexed().filter(col("k") === 5050L)
    assert(qn.collect().map(_.getLong(0)).toSeq == Seq(5050L))
    assert(scanFiles(qn) == 1)

    // third pass with nothing new: noop
    assert(t.optimizeClustered(Seq("k"), targetBytes = 4096).isEmpty)
  }

  test("straddling append: boundary-overlapping clustered files rewrite too, the rest stay") {
    val root = tmp("graft-cluster-straddle")
    val t = DeltaLite(spark, root, "k")
    t.append(batch(0, 1000))
    val Some((_, _)) = t.optimizeClustered(Seq("k"), targetBytes = 4096)
    val clustered = t.liveFiles().toSet
    assert(clustered.size >= 4, s"need several clustered files, got ${clustered.size}")
    // fresh rows confined to a narrow mid-range window
    val av = t.append(batch(498, 6)) // duplicates keys 498..503 (fine — plain rows)
    val freshCount = t.commitInfo(av)._2.size
    val Some((v2, n2)) = t.optimizeClustered(Seq("k"), targetBytes = 4096)
    val overlapRewritten = n2 - freshCount
    assert(overlapRewritten >= 1,
      "a straddling append must pull in at least one overlapping clustered file")
    assert(n2 < clustered.size + freshCount,
      s"straddle rewrote $n2 — that is the whole table, not the boundary")
    // untouched = clustered minus the removed overlap set
    val removed = t.commitInfo(v2)._3.toSet
    assert((clustered -- removed).subsetOf(t.liveFiles().toSet))
    assert(t.read().count() == 1006)
    // keys in the straddle window now appear twice (append duplicated them)
    assert(t.read().filter(col("k") === 500L).count() == 2)
  }

  test("deletion vectors fold into the incremental rewrite; changing cluster columns re-clusters fully") {
    val root = tmp("graft-cluster-dv")
    val t = DeltaLite(spark, root, "k")
    t.append(batch(0, 500))
    t.optimizeClustered(Seq("k"), targetBytes = 4096)
    val av = t.append(batch(9000, 50))
    assert(t.deleteWhere(col("k") === 9007L).isDefined) // DV on a fresh file
    val Some((v2, n2)) = t.optimizeClustered(Seq("k"), targetBytes = 4096)
    assert(n2 == t.commitInfo(av)._2.size)
    assert(t.read().filter(col("k") === 9007L).count() == 0,
      "the DV'd row resurfaced after the incremental rewrite")
    assert(t.read().count() == 549)
    // re-keying the clustering invalidates the cube list: full rewrite
    val live = t.liveFiles().size
    val Some((_, n3)) = t.optimizeClustered(Seq("v"), targetBytes = 4096)
    assert(n3 == live, s"a clustering-column change must re-cluster everything: $n3 vs $live")
  }

  test("checkpointed table: candidate selection runs in the entries parquet — zero entry loads, O(rewritten) driver rows") {
    val root = tmp("graft-cluster-df")
    val t = new DeltaLite(spark, root, Some("k"), checkpointInterval = 0) {
      override protected def commitSidecarThreshold: Int = 1
    }
    t.append(batch(0, 1000))
    val Some((_, _)) = t.optimizeClustered(Seq("k"), targetBytes = 4096)
    val clustered = t.liveFiles().toSet
    assert(clustered.size >= 4)
    val av = t.append(batch(5000, 80).repartition(2)) // disjoint fresh batch
    val freshFiles = t.commitInfo(av)._2
    assert(t.checkpointNow().isDefined)
    t.cleanLog()
    // fresh open: classification, the fresh+DV collect and the overlap
    // predicate must all run in the entries-parquet read
    val t2 = DeltaLite(spark, root, "k")
    val nLive = t2.liveFiles().size // fold once to size the bound
    val t3 = DeltaLite(spark, root, "k")
    val Some((v2, n2)) = t3.optimizeClustered(Seq("k"), targetBytes = 4096)
    assert(t3.entryLoads.get() == 0,
      "DF-path OPTIMIZE materialized the live entry set")
    assert(n2 == freshFiles.size,
      s"disjoint fresh batch must rewrite only itself: $n2")
    // exactly the fresh rows (no DVs, disjoint => no overlap rows)
    val collected = t3.entriesCollected.get()
    assert(collected == n2 && collected < nLive,
      s"OPTIMIZE collected $collected of $nLive entries for $n2 rewrites " +
        "— candidate selection did not push into the entries parquet")
    // byte-identical rewritten set vs the driver partition's rule
    assert(t3.commitInfo(v2)._3 == freshFiles)
    assert(clustered.subsetOf(DeltaLite(spark, root, "k").liveFiles().toSet))
    assert(DeltaLite(spark, root, "k").read().count() == 1080)
  }

  test("catalog: plain OPTIMIZE on a CLUSTER BY table goes incremental; zorder CALL stays the full rewrite") {
    graft.catalog.GraftCatalog.install(spark,
      Files.createTempDirectory("graft-cluster-inc-wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.inc")
    spark.sql("CREATE TABLE graft.inc.t (a BIGINT, v STRING) CLUSTER BY (a)")
    spark.range(0, 5000).selectExpr("id AS a", "repeat('x', 30) AS v")
      .writeTo("graft.inc.t").append()
    val m1 = spark.sql("OPTIMIZE graft.inc.t").head.getString(0)
    assert(m1.startsWith("clustered"), m1)
    // idle OPTIMIZE is a noop now — the old behavior rewrote the table
    // every time
    val m2 = spark.sql("OPTIMIZE graft.inc.t").head.getString(0)
    assert(m2.startsWith("noop"), m2)
    // disjoint append → only the fresh files recluster
    spark.range(100000, 100500).selectExpr("id AS a", "repeat('x', 30) AS v")
      .writeTo("graft.inc.t").append()
    val m3 = spark.sql("OPTIMIZE graft.inc.t").head.getString(0)
    assert(m3.startsWith("clustered"), m3)
    val n3 = m3.stripPrefix("clustered ").takeWhile(_.isDigit).toInt
    val totalFiles = spark.table("graft.inc.t")
      .select(input_file_name()).distinct().count()
    assert(n3 < totalFiles,
      s"catalog OPTIMIZE rewrote $n3 of $totalFiles files — not incremental")
  }
}
