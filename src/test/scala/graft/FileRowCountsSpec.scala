package graft

import graft.etl.{DeltaInterop, DeltaLite}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Per-file row counts recorded AT WRITE TIME (the reserved `__rows`
  * extra): COUNT(*) answers from metadata ([[DeltaLite.rowCount]]),
  * exports carry Delta's `numRecords`, and adoption reads it back —
  * the short-circuit every Delta reader takes from stats. Files
  * written before the rev (or adopted from stat-less sources) lack the
  * count until a rewrite (compact/upsert/optimize) re-records them —
  * rowCount() then answers None, never a wrong number.
  */
class FileRowCountsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("rowCount() answers COUNT(*) from metadata; DVs and pre-rev files conservatively None") {
    val t = new DeltaLite(spark, tmp("rows-count"), Some("k"))
    t.append((1L to 100L).map(k => (k, s"a$k")).toDF("k", "v"))
    t.append((101L to 150L).map(k => (k, s"b$k")).toDF("k", "v"))
    assert(t.rowCount() == Some(150L))
    // a stat-LESS table records counts too (the count agg runs even
    // with no stats key configured)
    val t2 = new DeltaLite(spark, tmp("rows-nostats"))
    t2.append((1L to 7L).map(k => (k, s"x$k")).toDF("k", "v"))
    assert(t2.rowCount() == Some(7L))
    // live DVs mask rows -> the physical counts would overcount
    t.deleteWhere(col("k") <= 10L)
    assert(t.rowCount().isEmpty,
      "rowCount must refuse while deletion vectors mask rows")
    // materialize rewrites the affected file and re-records its count
    t.materializeDeletes()
    assert(t.rowCount() == Some(140L))
    // an adopted plain-parquet file has no recorded count until a
    // rewrite re-records it
    val src = tmp("rows-conv-src")
    (1L to 9L).map(k => (k, s"c$k")).toDF("k", "v").repartition(2)
      .write.mode("overwrite").parquet(src)
    val tc = DeltaLite.convert(spark, src, tmp("rows-conv-root"))
    assert(tc.rowCount().isEmpty,
      "pre-existing files lack counts until restats/compact")
    // replace-mode ANALYZE records fresh counts from its own scan —
    // zero-copy adopted files gain metadata COUNT(*) without a rewrite
    tc.restats(Seq("k"))
    assert(tc.rowCount() == Some(9L),
      "restats must record row counts for adopted files")
    // single-key (merge-mode) restats PRESERVES the recorded counts
    tc.restats("k")
    assert(tc.rowCount() == Some(9L),
      "merge-mode restats must not wipe recorded counts")
    tc.compact(targetBytes = 1L << 30)
    assert(tc.liveFiles().size == 1, "compact must rewrite the files")
    assert(tc.rowCount() == Some(9L))
  }

  test("rowCount() answers through the checkpointed/sidecar entries path in one aggregate") {
    val t = new DeltaLite(spark, tmp("rows-ckpt"), Some("k"),
      checkpointInterval = 2)
    (0 until 5).foreach { i =>
      t.append((1L to 10L).map(k => (i * 10 + k, s"r$k")).toDF("k", "v"))
    }
    assert(t.latestVersion.exists(_ >= 4))
    t.checkpointNow()
    val before = t.entriesCollected.get()
    assert(t.rowCount() == Some(50L))
    assert(t.entriesCollected.get() == before,
      "the sidecar-path rowCount must not collect entry rows")
  }

  test("export emits numRecords; a Delta-reader-style stats COUNT equals the real count; re-adopt carries it") {
    val root = tmp("rows-export")
    val t = new DeltaLite(spark, root, Some("k"))
    t.append((1L to 40L).map(k => (k, s"a$k")).toDF("k", "v").coalesce(2))
    t.append((41L to 60L).map(k => (k, s"b$k")).toDF("k", "v").coalesce(1))
    t.exportToDelta()
    val snap = DeltaInterop.snapshot(spark, root)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val perFile = snap.files.map { f =>
      val st = f.stats.getOrElse(sys.error(s"no stats on ${f.path}"))
      val n = mapper.readTree(st).path("numRecords")
      assert(n.isIntegralNumber, s"no numRecords in $st")
      n.asLong()
    }
    assert(perFile.sum == 60L,
      s"stats COUNT diverged from the real count: $perFile")
    // the short-circuit a Delta reader takes — and our own re-adoption
    val re = DeltaLite.convertFromDelta(spark, root, tmp("rows-readopt"))
    assert(re.rowCount() == Some(60L),
      "adopted numRecords must land as metadata row counts")
    // and a re-EXPORT of the adopted table still carries them
    re.exportToDelta()
    val snap2 = DeltaInterop.snapshot(spark, re.root)
    assert(snap2.files.flatMap(_.stats).forall(_.contains("numRecords")))
  }

  test("rowCount on a lazy-path table whose entries carry extras but NO recorded count answers None (no ANSI element_at crash)") {
    // a DF-route adopted source with k-stats but no numRecords: the
    // v0 sidecar's rows have extra_cols = ["k"] and no "__rows" —
    // array_position yields 0 and an unguarded element_at would throw
    // INVALID_INDEX_OF_ZERO under ANSI instead of answering None
    val dir = tmp("rows-lazy-src")
    val stage = tmp("rows-lazy-stage")
    Seq((1L, "x"), (2L, "y")).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(dir, part.getName).toPath)
    val schemaString = org.apache.spark.sql.types.StructType.fromDDL(
      "k bigint, v string").json
    val cpT = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("add",
        org.apache.spark.sql.types.StructType.fromDDL(
          "path string, partitionValues map<string,string>, size long, " +
            "modificationTime long, dataChange boolean, stats string")),
      org.apache.spark.sql.types.StructField("metaData",
        org.apache.spark.sql.types.StructType.fromDDL(
          "id string, schemaString string, " +
            "partitionColumns array<string>, " +
            "configuration map<string,string>"))))
    val rows = Seq(
      org.apache.spark.sql.Row(
        org.apache.spark.sql.Row(part.getName,
          Map.empty[String, String], part.length(), 0L, true,
          """{"minValues":{"k":1},"maxValues":{"k":2}}"""), null),
      org.apache.spark.sql.Row(null,
        org.apache.spark.sql.Row("rows-lazy", schemaString,
          Seq.empty[String], Map.empty[String, String])))
    val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
    val cpStage = tmp("rows-lazy-cp")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), cpT)
      .coalesce(1).write.mode("overwrite").parquet(cpStage)
    val cpPart = new java.io.File(cpStage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(cpPart.toPath, new java.io.File(log,
      f"${0L}%020d.checkpoint.parquet").toPath)
    java.nio.file.Files.write(new java.io.File(log,
      f"${0L}%020d.json").toPath, "\n".getBytes("UTF-8"))
    spark.conf.set("spark.graft.adopt.sidecarThreshold", "1")
    try {
      val t = DeltaLite.convertFromDelta(spark, dir,
        tmp("rows-lazy-root"), statsKey = Some("k"))
      assert(t.jsonEntriesRendered.get() == 0, "must take the DF route")
      assert(t.rowCount().isEmpty,
        "no recorded counts -> None, never a crash or a wrong number")
      assert(t.read().count() == 2)
    } finally spark.conf.unset("spark.graft.adopt.sidecarThreshold")
  }

  test("the __rows pseudo-column never shadows a real column of that name") {
    val t = new DeltaLite(spark, tmp("rows-shadow"))
    t.append(Seq((1L, 5L), (2L, 6L)).toDF("k", "__rows"))
    // recording skipped -> no pseudo-range exists to mis-prune; reads
    // and filters on the real column stay exact
    assert(t.rowCount().isEmpty)
    assert(t.read().filter(col("__rows") === 5L).count() == 1L)
    val u = t.updateWhere(col("__rows") === 6L, Seq("__rows" -> lit(60L)))
    assert(u.isDefined)
    assert(t.read().filter(col("__rows") === 60L).count() == 1L)
  }
}
