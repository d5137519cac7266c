package graft

import graft.etl.DeltaLite
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** CONVERT TO DELTA: metadata-only adoption of an existing parquet
  * directory — the v0 commit re-references the files in place, so a
  * 100 TB lake imports without moving a byte; everything the format
  * offers (versioning, upsert, deletes, time travel, skipping after
  * restats) then works on top.
  */
class ConvertSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def writeSource(dir: String): Unit =
    (1L to 100L).map(k => (k, s"row$k")).toDF("k", "v")
      .repartition(4).write.mode("overwrite").parquet(dir)

  test("convert adopts files in place: zero copy, full table surface on top") {
    val src = tmp("graft-conv-src")
    writeSource(src)
    val srcFiles = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSet
    val t = DeltaLite.convert(spark, src, tmp("graft-conv-root"),
      statsKey = Some("k"))
    assert(t.latestVersion.contains(0))
    // zero-copy: the live set IS the source files, nothing new on disk
    assert(t.liveFiles().map(p =>
      new org.apache.hadoop.fs.Path(p).toUri.getPath).toSet ==
      srcFiles.map(p => new org.apache.hadoop.fs.Path(p).toUri.getPath).toSet)
    assert(t.read().count() == 100)
    // the adopted table is a full citizen: upsert, delete, time travel
    t.upsert(Seq((7L, "updated7"), (101L, "new101")).toDF("k", "v"), "k")
    val m = t.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(7L) == "updated7" && m(101L) == "new101" && m.size == 101)
    t.deleteWhere($"k" === 50L)
    assert(t.read().count() == 100)
    assert(t.readAsOf(0).count() == 100) // pre-upsert snapshot intact
    // CONVERT-then-ANALYZE: restats lights up file skipping
    t.restats("k")
    assert(t.liveFileStats().exists(_._2.isDefined))
  }

  test("in-place convert: the log lands inside the source dir") {
    val src = tmp("graft-conv-inplace")
    writeSource(src)
    val t = DeltaLite.convert(spark, src, src)
    assert(t.read().count() == 100)
    assert(new java.io.File(src, "_log/0.json").exists())
    t.append(Seq((200L, "row200")).toDF("k", "v"))
    assert(t.read().count() == 101)
    // re-convert of an already-converted dir is refused
    val e = intercept[IllegalArgumentException](
      DeltaLite.convert(spark, src, src))
    assert(e.getMessage.contains("already"))
  }

  test("vacuum never reaches outside the table root to the adopted files") {
    val src = tmp("graft-conv-vac-src")
    writeSource(src)
    val t = DeltaLite.convert(spark, src, tmp("graft-conv-vac-root"))
    // overwrite makes the adopted files dead weight — but they live
    // OUTSIDE the root, so vacuum must leave them alone (clone rule)
    t.overwrite(Seq((1L, "only")).toDF("k", "v"))
    t.vacuum(retainVersions = 1)
    assert(new java.io.File(src).listFiles()
      .count(_.getName.endsWith(".parquet")) == 4,
      "vacuum deleted adopted source files outside the table root")
  }

  test("deep clone owns its storage and carries layout, constraints and semantics") {
    val t = new DeltaLite(spark, tmp("graft-deep-src"), Some("k"),
      partitionBy = Seq("etype"))
    t.append(Seq((1L, "click", 10.0), (2L, "view", 20.0), (3L, "click", 30.0),
      (4L, "purchase", 40.0)).toDF("k", "etype", "v"))
    t.deleteWhere(col("k") === 2L)          // DV applied in the clone
    t.renameColumn("v", "value")            // logical names carry
    t.addCheckConstraint("v_pos", "value > 0")
    val c = t.deepCloneTo(tmp("graft-deep-tgt"))
    // snapshot semantics: same visible rows, logical names, fresh v0
    assert(c.latestVersion.contains(0))
    assert(c.schema.get.fieldNames.toSeq == Seq("k", "etype", "value"))
    val got = c.read().collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == Map(1L -> 10.0, 3L -> 30.0, 4L -> 40.0))
    // the clone OWNS its files: all under its root, hive layout kept
    assert(c.liveFiles().forall(_.contains("graft-deep-tgt")))
    assert(c.liveFiles().forall(_.contains("__p_")))
    assert(c.partitionColumns == Seq("etype"))
    // source vacuum/overwrite cannot touch the clone (unlike shallow)
    t.overwrite(Seq((99L, "click", 1.0)).toDF("k", "etype", "value"))
    t.vacuum(retainVersions = 1)
    assert(c.read().count() == 3)
    // the carried constraint gates the clone's own loads
    intercept[IllegalStateException](
      c.append(Seq((5L, "click", -1.0)).toDF("k", "etype", "value")))
    assert(c.read().count() == 3)
  }

  test("hive-partitioned sources are refused with guidance") {
    val src = tmp("graft-conv-hive")
    (1L to 20L).map(k => (k, if (k % 2 == 0) "a" else "b"))
      .toDF("k", "part").write.partitionBy("part").mode("overwrite").parquet(src)
    val e = intercept[IllegalArgumentException](
      DeltaLite.convert(spark, src, tmp("graft-conv-hive-root")))
    assert(e.getMessage.contains("hive-partitioned"))
  }
}
