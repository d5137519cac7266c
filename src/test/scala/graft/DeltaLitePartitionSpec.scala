package graft

import graft.etl.DeltaLite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import java.nio.file.Files

/** Declared partition columns as a DeltaLite table property: the spec
  * lives in the commit log, writes lay out hive `__p_<phys>=<value>`
  * dirs (file CONTENT keeps every column — no basePath juggling on
  * read), and the commit-log FileIndex turns each file's path value
  * into a [v,v] pruning range, so a partition filter plans only the
  * matching partition's files. At 100 TB this is the first-line
  * pruning tool — the scan never lists a pruned partition.
  */
class DeltaLitePartitionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def sample = Seq(
    (1L, "click", 10.0), (2L, "click", 20.0), (3L, "view", 30.0),
    (4L, "view", 40.0), (5L, "purchase", 50.0), (6L, "purchase", 60.0),
    (7L, "click", 70.0), (8L, "purchase", 80.0)
  ).toDF("id", "etype", "v")

  /** The table's own scan (the one served by the DeltaLite FileIndex),
    * dug out of the executed plan — recursing through AQE query stages
    * (a DV anti-join nests the scan inside one) and skipping the DV
    * sidecar's plain parquet scan.
    */
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

  test("partitioned writes lay out hive dirs; reads serve full content") {
    val root = tmp("graft-part")
    val t = new DeltaLite(spark, root, partitionBy = Seq("etype"))
    t.append(sample)
    assert(t.partitionColumns == Seq("etype"))
    // hive layout exists, one dir per value
    val dirs = t.liveFiles().flatMap(_.split('/').find(_.startsWith("__p_etype=")))
      .distinct.sorted
    assert(dirs == Seq("__p_etype=click", "__p_etype=purchase", "__p_etype=view"))
    // content is complete (partition column included), values intact
    val got = t.read().orderBy("id").collect()
    assert(got.length == 8)
    assert(got.map(_.getString(1)).toSeq ==
      Seq("click", "click", "view", "view", "purchase", "purchase", "click", "purchase"))
  }

  test("scan plans only the matching partition's files, results equal the flat filter") {
    val root = tmp("graft-part-prune")
    val t = new DeltaLite(spark, root, partitionBy = Seq("etype"))
    t.append(sample)
    t.append(sample.withColumn("id", $"id" + 100L)) // second commit, same layout
    val all = t.liveFiles()
    val purchaseFiles = all.count(_.contains("__p_etype=purchase"))
    assert(purchaseFiles >= 2 && purchaseFiles < all.size)
    val q = t.readIndexed().filter($"etype" === "purchase")
    val rows = q.collect()
    assert(rows.length == 6)
    val scanned = scanOf(q).metrics("numFiles").value
    assert(scanned == purchaseFiles,
      s"scan planned $scanned files; only the $purchaseFiles purchase files should survive")
    // a non-partition filter keeps everything (no wrong pruning)
    assert(t.readIndexed().filter($"v" > 45.0).count() == 8)
  }

  test("partition spec survives checkpoint + cleanLog; the log is authoritative") {
    val root = tmp("graft-part-ckpt")
    val t = new DeltaLite(spark, root, partitionBy = Seq("etype"))
    (0 until 12).foreach(i =>
      t.append(sample.withColumn("id", $"id" + lit(i * 10L))))
    t.checkpointNow()
    t.cleanLog()
    val t2 = new DeltaLite(spark, root) // no declaration: log wins
    assert(t2.partitionColumns == Seq("etype"))
    val q = t2.readIndexed().filter($"etype" === "view")
    assert(q.collect().length == 24) // collect: q's own plan runs, metrics populate
    assert(scanOf(q).metrics("numFiles").value ==
      t2.liveFiles().count(_.contains("__p_etype=view")))
    // a differing constructor declaration is ignored for an existing
    // table — partitioning is a table property, the log wins
    val bad = new DeltaLite(spark, root, partitionBy = Seq("v"))
    assert(bad.partitionColumns == Seq("etype"))
  }

  test("partition column renames stay metadata-only and keep pruning; drop is blocked") {
    val root = tmp("graft-part-rename")
    val t = new DeltaLite(spark, root, partitionBy = Seq("etype"))
    t.append(sample)
    val filesBefore = t.liveFiles().toSet
    t.renameColumn("etype", "kind")
    assert(t.liveFiles().toSet == filesBefore)
    assert(t.partitionColumns == Seq("kind"))
    // writes under the new logical name land in the SAME physical dirs
    t.append(sample.withColumnRenamed("etype", "kind")
      .withColumn("id", $"id" + 200L))
    assert(t.liveFiles().forall(_.contains("__p_etype=")))
    val q = t.readIndexed().filter($"kind" === "click")
    assert(q.collect().length == 6)
    assert(scanOf(q).metrics("numFiles").value ==
      t.liveFiles().count(_.contains("__p_etype=click")))
    intercept[IllegalArgumentException](t.dropColumn("kind"))
  }

  test("deletes and compaction keep partition semantics") {
    val root = tmp("graft-part-del")
    val t = new DeltaLite(spark, root, partitionBy = Seq("etype"))
    t.append(sample)
    t.deleteWhere($"id" === 5L)
    assert(t.read().count() == 7)
    assert(t.readIndexed().filter($"etype" === "purchase").count() == 2)
    t.append(sample.withColumn("id", $"id" + 300L))
    t.compact(targetBytes = 1L << 20, minFiles = 2)
    // compaction rewrites THROUGH the partitioned write path
    assert(t.liveFiles().forall(_.contains("__p_etype=")))
    assert(t.read().count() == 15)
    val q = t.readIndexed().filter($"etype" === "view")
    assert(q.collect().length == 4)
    assert(scanOf(q).metrics("numFiles").value ==
      t.liveFiles().count(_.contains("__p_etype=view")))
  }

  test("a batch missing a declared partition column is rejected") {
    val root = tmp("graft-part-miss")
    val t = new DeltaLite(spark, root, partitionBy = Seq("etype"))
    val e = intercept[IllegalArgumentException](
      t.append(Seq((1L, 2.0)).toDF("id", "v")))
    assert(e.getMessage.contains("etype"))
  }

  test("replaceWhere atomically swaps one partition, leaves the rest byte-identical") {
    val root = tmp("graft-part-rw")
    val t = new DeltaLite(spark, root, partitionBy = Seq("etype"))
    t.append(sample)
    t.append(sample.withColumn("id", $"id" + 100L))
    val before = t.liveFiles()
    val untouchedBefore = before.filterNot(_.contains("__p_etype=click")).toSet
    val v0 = t.latestVersion.get
    // reload the click slice with 2 fresh rows (was 6)
    val fresh = Seq((900L, "click", 1.0), (901L, "click", 2.0))
      .toDF("id", "etype", "v")
    val v1 = t.replaceWhere(fresh, $"etype" === "click")
    assert(v1 == v0 + 1, "replaceWhere is ONE commit")
    assert(t.commitInfo(v1)._1 == "rewrite")
    val after = t.read().collect()
    assert(after.count(_.getString(1) == "click") == 2)
    assert(after.count(_.getString(1) == "view") == 4)
    assert(after.count(_.getString(1) == "purchase") == 6)
    // non-replaced partitions keep their exact files (zero rewrite)
    val untouchedAfter = t.liveFiles().filterNot(_.contains("__p_etype=click")).toSet
    assert(untouchedAfter == untouchedBefore)
    // time travel to before the replace sees the old slice
    assert(t.readAsOf(v0).filter($"etype" === "click").count() == 6)
  }

  test("streaming sink composes with partitioned tables and interval checkpoints") {
    val root = tmp("graft-part-sink")
    // interval 5 so the micro-batch stream crosses a checkpoint boundary
    val t = new DeltaLite(spark, root, None, checkpointInterval = 5,
      partitionBy = Seq("etype"))
    implicit val sqlCtx = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Double)]
    val q = graft.streaming.DeltaSink.start(
      src.toDF().toDF("id", "etype", "v"), t, "part-sink",
      tmp("graft-part-sink-ckpt"))
    try {
      (0 until 7).foreach { i =>
        src.addData((i.toLong, if (i % 2 == 0) "click" else "view", i * 1.0))
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(t.read().count() == 7)
    // every committed file landed in its hive partition dir
    assert(t.liveFiles().forall(_.contains("__p_etype=")))
    // the version stream crossed the interval: a checkpoint was written
    assert(t.latestVersion.exists(_ >= 5))
    assert(new java.io.File(root, "_log").list()
      .exists(_.endsWith(".checkpoint.meta.json")))
    // pruned read over the streamed table
    val clicks = t.readIndexed().filter($"etype" === "click")
    assert(clicks.collect().length == 4)
    assert(scanOf(clicks).metrics("numFiles").value ==
      t.liveFiles().count(_.contains("__p_etype=click")))
  }

  test("compactWhere bin-packs only the matching partition; other partitions see zero churn") {
    val root = tmp("graft-part-cw")
    val t = new DeltaLite(spark, root, partitionBy = Seq("etype"))
    (0 until 4).foreach(i =>
      t.append(sample.withColumn("id", $"id" + lit(i * 10L))))
    val before = t.liveFiles()
    val clickBefore = before.count(_.contains("__p_etype=click"))
    val otherBefore = before.filterNot(_.contains("__p_etype=click")).toSet
    assert(clickBefore >= 4)
    val v = t.compactWhere($"etype" === "click", targetBytes = 1L << 20)
    assert(v.isDefined)
    val after = t.liveFiles()
    assert(after.count(_.contains("__p_etype=click")) < clickBefore)
    assert(after.filterNot(_.contains("__p_etype=click")).toSet == otherBefore,
      "compactWhere must not touch other partitions' files")
    assert(t.read().count() == 32)
    assert(t.readIndexed().filter($"etype" === "click").count() == 12)
    // predicate restriction mirrors replaceWhere
    intercept[IllegalArgumentException](t.compactWhere($"v" > 0.0))
  }

  test("replaceWhere validates the batch and the predicate") {
    val root = tmp("graft-part-rw-guard")
    val t = new DeltaLite(spark, root, partitionBy = Seq("etype"))
    t.append(sample)
    // batch rows outside the replaced region are rejected
    val eOut = intercept[IllegalArgumentException](t.replaceWhere(
      Seq((900L, "view", 1.0)).toDF("id", "etype", "v"),
      $"etype" === "click"))
    assert(eOut.getMessage.contains("outside"))
    // predicate on a non-partition column is rejected
    val eCol = intercept[IllegalArgumentException](t.replaceWhere(
      Seq((900L, "click", 1.0)).toDF("id", "etype", "v"),
      $"v" > 0.0))
    assert(eCol.getMessage.contains("partition columns"))
    // unpartitioned table is rejected
    val u = DeltaLite(spark, tmp("graft-part-rw-unpart"))
    u.append(sample)
    intercept[IllegalArgumentException](
      u.replaceWhere(sample, $"etype" === "click"))
    // nothing committed by any failed attempt
    assert(t.latestVersion.contains(0))
    assert(t.read().count() == 8)
  }

  test("replaceWhere rejects rows where the predicate evaluates NULL") {
    val root = tmp("graft-part-rw-null")
    val t = new DeltaLite(spark, root, partitionBy = Seq("etype"))
    t.append(sample)
    // a null partition value makes `etype === 'click'` NULL — not
    // inside the region, and the hive null partition is never in the
    // replaced file set, so it must be rejected like Delta does
    val batch = Seq((900L, Option("click"), 1.0), (901L, Option.empty[String], 2.0))
      .toDF("id", "etype", "v")
    val e = intercept[IllegalArgumentException](
      t.replaceWhere(batch, $"etype" === "click"))
    assert(e.getMessage.contains("outside"))
    assert(t.latestVersion.contains(0))
  }
}
