package graft

import graft.etl.{DeltaInterop, DeltaLite}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** DF-NATIVE adoption replay: a checkpoint-backed Delta source adopts
  * with the checkpoint's add rows relabeled into the v0 sidecar BY A
  * SPARK JOB — the driver never renders an O(live-files) entry list
  * (`jsonEntriesRendered` stays 0 through the adoption) and the
  * adopted table's read/detail match the driver-fold adoption of the
  * same source exactly.
  */
class DeltaAdoptDfSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Checkpoint-backed source: `n` one-row files under the table dir,
    * a checkpoint parquet at v0 listing them all (with k-stats and a
    * partition value), one JSON tail commit adding one more file and
    * removing one checkpoint file.
    */
  private def checkpointedSource(n: Int): (String, Int) = {
    val dir = tmp("dl-df-src")
    // land n tiny files in ONE write, then reference them individually
    val stage = tmp("dl-df-stage")
    (1 to n).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(n, col("k")).write.mode("overwrite").parquet(stage)
    val fsLocal = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName).toSeq
    fsLocal.foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(dir, f.getName).toPath)
    }
    val names = fsLocal.map(_.getName)
    val schemaString = org.apache.spark.sql.types.StructType.fromDDL(
      "k bigint, v string").json
    val addT = org.apache.spark.sql.types.StructType.fromDDL(
      "path string, partitionValues map<string,string>, size long, " +
        "modificationTime long, dataChange boolean, stats string")
    val metaT = org.apache.spark.sql.types.StructType.fromDDL(
      "id string, schemaString string, partitionColumns array<string>, " +
        "configuration map<string,string>")
    val protoT = org.apache.spark.sql.types.StructType.fromDDL(
      "minReaderVersion int, minWriterVersion int")
    val cpT = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("add", addT),
      org.apache.spark.sql.types.StructField("metaData", metaT),
      org.apache.spark.sql.types.StructField("protocol", protoT)))
    def szOf(name: String) = new java.io.File(dir, name).length()
    val rows =
      Seq(Row(null, null, Row(1, 2)),
        Row(null, Row("df-fixture", schemaString, Seq.empty[String],
          Map.empty[String, String]), null)) ++
        names.map { nm =>
          Row(Row(nm, Map.empty[String, String], szOf(nm),
            0L, true, null), null, null)
        }
    val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
    val cpStage = tmp("dl-df-cp")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), cpT)
      .write.mode("overwrite").parquet(cpStage)
    // multi-part checkpoint: rename the parts into the Delta naming
    val parts = new java.io.File(cpStage).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (p, i) =>
      java.nio.file.Files.copy(p.toPath, new java.io.File(log,
        f"${0L}%020d.checkpoint.${i + 1}%010d.${parts.length}%010d.parquet")
        .toPath)
    }
    java.nio.file.Files.write(new java.io.File(log,
      f"${0L}%020d.json").toPath, "\n".getBytes("UTF-8"))
    // JSON tail: v1 removes the first checkpoint file
    java.nio.file.Files.write(new java.io.File(log,
      f"${1L}%020d.json").toPath,
      (s"""{"remove":{"path":"${names.head}","deletionTimestamp":1,"dataChange":true}}""" +
        "\n").getBytes("UTF-8"))
    // expected live ROWS: the hash repartition skews rows per file, so
    // derive the count from the surviving files themselves
    val liveRows = spark.read.parquet(
      names.tail.map(nm => s"$dir/$nm"): _*).count()
    (dir, liveRows.toInt)
  }

  test("checkpoint adds relabel in a Spark job: zero driver-rendered entries, sidecar-backed v0, fold parity") {
    val (dir, liveN) = checkpointedSource(24)
    spark.conf.set("spark.graft.adopt.sidecarThreshold", "8")
    try {
      val t = DeltaLite.convertFromDelta(spark, dir, tmp("dl-df-root"))
      assert(t.jsonEntriesRendered.get() == 0,
        "DF-native adoption must not render entry rows into JSON " +
          "driver-side")
      // the v0 commit is sidecar-backed (pre-externalized record)
      val logFiles = new java.io.File(s"${t.root}/_log").listFiles()
        .map(_.getName)
      assert(logFiles.exists(_.endsWith(".sidecar.entries")),
        s"v0 must externalize its entries: ${logFiles.toSeq}")
      assert(t.read().count() == liveN)
      // fold parity: the driver-route adoption of the SAME source
      spark.conf.set("spark.graft.adopt.sidecarThreshold",
        Int.MaxValue.toString)
      val fold = DeltaLite.convertFromDelta(spark, dir, tmp("dl-df-fold"))
      val a = t.read().collect().map(r =>
        (r.getLong(0), r.getString(1))).toSet
      val b = fold.read().collect().map(r =>
        (r.getLong(0), r.getString(1))).toSet
      assert(a == b, "DF route must adopt the same live set as the fold")
      assert(t.liveFiles().map(p => new org.apache.hadoop.fs.Path(p)
        .getName).toSet ==
        fold.liveFiles().map(p => new org.apache.hadoop.fs.Path(p)
          .getName).toSet)
    } finally spark.conf.unset("spark.graft.adopt.sidecarThreshold")
  }

  test("DF route carries stats and PARTITION values; inexpressible layouts fall back to the fold") {
    // partitioned + stats checkpoint source
    val dir = tmp("dl-dfp-src")
    def land(sub: String, rows: Seq[(Long, String)]): (String, Long) = {
      new java.io.File(dir, sub).mkdirs()
      val stage = tmp("dl-dfp-stage")
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(stage)
      val p = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(p.toPath,
        new java.io.File(s"$dir/$sub", p.getName).toPath)
      (s"$sub/${p.getName}", p.length())
    }
    val (fE, szE) = land("region=east", (1L to 5L).map(k => (k, s"e$k")))
    val (fW, szW) = land("region=west", (6L to 9L).map(k => (k, s"w$k")))
    val schemaString = org.apache.spark.sql.types.StructType.fromDDL(
      "k bigint, v string, region string").json
    val addT = org.apache.spark.sql.types.StructType.fromDDL(
      "path string, partitionValues map<string,string>, size long, " +
        "modificationTime long, dataChange boolean, stats string")
    val metaT = org.apache.spark.sql.types.StructType.fromDDL(
      "id string, schemaString string, partitionColumns array<string>, " +
        "configuration map<string,string>")
    val protoT = org.apache.spark.sql.types.StructType.fromDDL(
      "minReaderVersion int, minWriterVersion int")
    val cpT = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("add", addT),
      org.apache.spark.sql.types.StructField("metaData", metaT),
      org.apache.spark.sql.types.StructField("protocol", protoT)))
    def st(lo: Long, hi: Long) =
      s"""{"numRecords":5,"minValues":{"k":$lo},"maxValues":{"k":$hi}}"""
    val rows = Seq(
      Row(null, null, Row(1, 2)),
      Row(null, Row("dfp-fixture", schemaString, Seq("region"),
        Map.empty[String, String]), null),
      Row(Row(fE, Map("region" -> "east"), szE, 0L, true, st(1, 5)),
        null, null),
      Row(Row(fW, Map("region" -> "west"), szW, 0L, true, st(6, 9)),
        null, null))
    val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
    val cpStage = tmp("dl-dfp-cp")
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), cpT)
      .coalesce(1).write.mode("overwrite").parquet(cpStage)
    val part = new java.io.File(cpStage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath, new java.io.File(log,
      f"${0L}%020d.checkpoint.parquet").toPath)
    java.nio.file.Files.write(new java.io.File(log,
      f"${0L}%020d.json").toPath, "\n".getBytes("UTF-8"))
    spark.conf.set("spark.graft.adopt.sidecarThreshold", "2")
    try {
      val t = DeltaLite.convertFromDelta(spark, dir, tmp("dl-dfp-root"),
        statsKey = Some("k"))
      // injected partition values through the sidecar-backed entries
      assert(t.read().filter(col("region") === "east").count() == 5)
      assert(t.read().count() == 9)
      // adopted k-stats prune a point upsert file-granularly
      val before = t.liveFiles().toSet
      t.upsert(Seq((7L, "updated", "west")).toDF("k", "v", "region"), "k")
      val after = t.liveFiles().toSet
      assert((before intersect after).size == 1,
        s"east's file must survive a west-range upsert: $before -> $after")
      assert(t.read().count() == 9)
    } finally spark.conf.unset("spark.graft.adopt.sidecarThreshold")
    // %-encoded checkpoint path -> the DF route now RESOLVES it in
    // the relabel columns (url_decode with a +-preserving pre-encode)
    // and stays DF-native
    val dir2 = tmp("dl-dfq-src")
    val (f2, sz2) = {
      val stage = tmp("dl-dfq-stage")
      Seq((1L, "x")).toDF("k", "v").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val p = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(p.toPath,
        new java.io.File(dir2, p.getName).toPath)
      (p.getName, p.length())
    }
    val schemaString2 = org.apache.spark.sql.types.StructType.fromDDL(
      "k bigint, v string").json
    val rows2 = Seq(
      Row(null, null, Row(1, 2)),
      Row(null, Row("dfq-fixture", schemaString2, Seq.empty[String],
        Map.empty[String, String]), null),
      Row(Row(f2.replaceFirst("part", "p%61rt"),
        Map.empty[String, String], sz2, 0L, true, null), null, null))
    val log2 = new java.io.File(dir2, "_delta_log"); log2.mkdirs()
    val cpStage2 = tmp("dl-dfq-cp")
    spark.createDataFrame(spark.sparkContext.parallelize(rows2, 1), cpT)
      .coalesce(1).write.mode("overwrite").parquet(cpStage2)
    val part2 = new java.io.File(cpStage2).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part2.toPath, new java.io.File(log2,
      f"${0L}%020d.checkpoint.parquet").toPath)
    java.nio.file.Files.write(new java.io.File(log2,
      f"${0L}%020d.json").toPath, "\n".getBytes("UTF-8"))
    spark.conf.set("spark.graft.adopt.sidecarThreshold", "1")
    try {
      val t2 = DeltaLite.convertFromDelta(spark, dir2, tmp("dl-dfq-root"))
      assert(t2.jsonEntriesRendered.get() == 0,
        "a %-encoded path must no longer decline the DF route")
      assert(t2.read().count() == 1,
        "the %-encoded layout must adopt DF-natively")
      assert(t2.liveFiles() == Seq(s"$dir2/$f2"),
        s"decoded path diverged: ${t2.liveFiles()}")
    } finally spark.conf.unset("spark.graft.adopt.sidecarThreshold")
    // ABSOLUTE-URI checkpoint path (external file) also stays DF-native
    val dir3 = tmp("dl-dfa-src")
    val rows3 = Seq(
      Row(null, null, Row(1, 2)),
      Row(null, Row("dfa-fixture", schemaString2, Seq.empty[String],
        Map.empty[String, String]), null),
      Row(Row(s"file:$dir2/$f2", Map.empty[String, String], sz2, 0L,
        true, null), null, null))
    val log3 = new java.io.File(dir3, "_delta_log"); log3.mkdirs()
    val cpStage3 = tmp("dl-dfa-cp")
    spark.createDataFrame(spark.sparkContext.parallelize(rows3, 1), cpT)
      .coalesce(1).write.mode("overwrite").parquet(cpStage3)
    val part3 = new java.io.File(cpStage3).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part3.toPath, new java.io.File(log3,
      f"${0L}%020d.checkpoint.parquet").toPath)
    java.nio.file.Files.write(new java.io.File(log3,
      f"${0L}%020d.json").toPath, "\n".getBytes("UTF-8"))
    spark.conf.set("spark.graft.adopt.sidecarThreshold", "1")
    try {
      val t3 = DeltaLite.convertFromDelta(spark, dir3, tmp("dl-dfa-root"))
      assert(t3.jsonEntriesRendered.get() == 0,
        "an absolute-URI path must no longer decline the DF route")
      assert(t3.read().count() == 1)
    } finally spark.conf.unset("spark.graft.adopt.sidecarThreshold")
  }

  test("100k-file checkpointed source adopts DF-natively: bounded driver rows, partition pruning plans from the log") {
    // adoption is METADATA-ONLY, so the fixture needs no data bytes:
    // a real checkpoint parquet listing 100k synthetic adds across
    // 200 partitions (sizes + per-file k-stats + partitionValues in
    // the log) adopts and PLANS without a single data-file stat
    val n = 100000
    val parts = 200
    val dir = tmp("dl-df100k-src")
    val schemaString = org.apache.spark.sql.types.StructType.fromDDL(
      "k bigint, v string, p string").json
    val addT = org.apache.spark.sql.types.StructType.fromDDL(
      "path string, partitionValues map<string,string>, size long, " +
        "modificationTime long, dataChange boolean, stats string")
    val metaT = org.apache.spark.sql.types.StructType.fromDDL(
      "id string, schemaString string, partitionColumns array<string>, " +
        "configuration map<string,string>")
    val protoT = org.apache.spark.sql.types.StructType.fromDDL(
      "minReaderVersion int, minWriterVersion int")
    val cpT = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("add", addT),
      org.apache.spark.sql.types.StructField("metaData", metaT),
      org.apache.spark.sql.types.StructField("protocol", protoT)))
    val head: Seq[Row] = Seq(
      Row(null, null, Row(1, 2)),
      Row(null, Row("df100k", schemaString, Seq("p"),
        Map.empty[String, String]), null))
    // adds built DISTRIBUTED — the fixture itself must not be a
    // driver loop over 100k objects
    val addRows = spark.range(n).rdd.map { idRow =>
      val i = idRow
      val part = s"p${i % parts}"
      Row(Row(s"$part/f$i.parquet", Map("p" -> part), 1000L, 0L, true,
        s"""{"numRecords":10,"minValues":{"k":${i * 10}},""" +
          s""""maxValues":{"k":${i * 10 + 9}}}"""), null, null)
    }
    val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
    val cpStage = tmp("dl-df100k-cp")
    spark.createDataFrame(
      spark.sparkContext.parallelize(head, 1).union(addRows), cpT)
      .write.mode("overwrite").parquet(cpStage)
    val partsF = new java.io.File(cpStage).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    partsF.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.copy(f.toPath, new java.io.File(log,
        f"${0L}%020d.checkpoint.${i + 1}%010d.${partsF.length}%010d.parquet")
        .toPath)
    }
    java.nio.file.Files.write(new java.io.File(log,
      f"${0L}%020d.json").toPath, "\n".getBytes("UTF-8"))
    val t0 = System.nanoTime()
    val t = DeltaLite.convertFromDelta(spark, dir, tmp("dl-df100k-root"),
      statsKey = Some("k"))
    val secs = (System.nanoTime() - t0) / 1e9
    // zero O(live) driver work: no entry row was ever rendered to
    // JSON, and the v0 record is sidecar-backed with exact counts
    assert(t.jsonEntriesRendered.get() == 0,
      "100k-file adoption must not render entries driver-side")
    val d = t.detail().head
    assert(d.getAs[Long]("num_live_files") == n, d.toString)
    // a partition filter PLANS only p42's 500 files straight from the
    // log metadata — no filesystem call, no data byte (the files do
    // not even exist); the index is asked directly so nothing executes
    val q = t.readIndexed().filter(col("p") === "p42")
    val scan = q.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val collected0 = t.entriesCollected.get()
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
    val attr = AttributeReference("p",
      org.apache.spark.sql.types.StringType)()
    val listed = scan.relation.location.listFiles(
      Seq(EqualTo(attr, Literal("p42"))), Nil)
    assert(listed.map(_.files.length).sum == n / parts,
      s"partition filter must plan ${n / parts} files")
    // and the lazy prune collected O(partition), never O(live)
    val collected = t.entriesCollected.get() - collected0
    assert(collected <= 2L * n / parts,
      s"driver rows for one partition's listing: $collected")
    assert(secs < 120, s"100k-file adoption took ${secs}s")
  }

  test("tail removes of %-encoded absolute-URI adds EXCLUDE on the DF route; invalid escapes fall back to the raw path") {
    // the driver's exclusion set keeps absolute-URI %-escapes LITERAL
    // (Hadoop Path never url-decodes), so the DF route's pathn must
    // too — a decoded twin would miss the anti-join and resurrect the
    // removed file
    val dir = tmp("dl-dfu-src")
    val stage = tmp("dl-dfu-stage")
    Seq((1L, "x")).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(stage)
    val p0 = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val ext = tmp("dl-dfu-ext")
    // external file whose name needs %-encoding, plus a keeper
    java.nio.file.Files.copy(p0.toPath,
      new java.io.File(ext, "a b.parquet").toPath)
    java.nio.file.Files.copy(p0.toPath,
      new java.io.File(dir, "keep.parquet").toPath)
    val gonePath = s"file:$ext/a%20b.parquet"
    val schemaString = org.apache.spark.sql.types.StructType.fromDDL(
      "k bigint, v string").json
    val cpT = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("add",
        org.apache.spark.sql.types.StructType.fromDDL(
          "path string, partitionValues map<string,string>, " +
            "size long, modificationTime long, dataChange boolean")),
      org.apache.spark.sql.types.StructField("metaData",
        org.apache.spark.sql.types.StructType.fromDDL(
          "id string, schemaString string, " +
            "partitionColumns array<string>, " +
            "configuration map<string,string>"))))
    val rows = Seq(
      Row(Row(gonePath, Map.empty[String, String], p0.length(), 0L,
        true), null),
      Row(Row("keep.parquet", Map.empty[String, String], p0.length(),
        0L, true), null),
      Row(null, Row("dfu", schemaString, Seq.empty[String],
        Map.empty[String, String])))
    val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
    val cpStage = tmp("dl-dfu-cp")
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), cpT)
      .coalesce(1).write.mode("overwrite").parquet(cpStage)
    val cpPart = new java.io.File(cpStage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(cpPart.toPath, new java.io.File(log,
      f"${0L}%020d.checkpoint.parquet").toPath)
    java.nio.file.Files.write(new java.io.File(log,
      f"${0L}%020d.json").toPath, "\n".getBytes("UTF-8"))
    // v1 tail REMOVES the %-encoded external add
    java.nio.file.Files.write(new java.io.File(log,
      f"${1L}%020d.json").toPath,
      (s"""{"remove":{"path":"$gonePath","deletionTimestamp":1,""" +
        """"dataChange":true}}""" + "\n").getBytes("UTF-8"))
    spark.conf.set("spark.graft.adopt.sidecarThreshold", "1")
    try {
      val t = DeltaLite.convertFromDelta(spark, dir, tmp("dl-dfu-root"))
      assert(t.jsonEntriesRendered.get() == 0, "must take the DF route")
      assert(t.liveFiles().map(p =>
        new org.apache.hadoop.fs.Path(p).getName) == Seq("keep.parquet"),
        s"the removed %-encoded add resurrected: ${t.liveFiles()}")
      assert(t.read().count() == 1)
      // fold parity on the same source
      spark.conf.set("spark.graft.adopt.sidecarThreshold",
        Int.MaxValue.toString)
      val fold = DeltaLite.convertFromDelta(spark, dir,
        tmp("dl-dfu-fold"))
      assert(fold.liveFiles().map(p =>
        new org.apache.hadoop.fs.Path(p).getName) == Seq("keep.parquet"))
    } finally spark.conf.unset("spark.graft.adopt.sidecarThreshold")
    // INVALID %-escape: a sloppy writer's un-encoded path adopts
    // verbatim (the driver's URISyntaxException fallback) instead of
    // failing the relabel job
    val dir2 = tmp("dl-dfi-src")
    java.nio.file.Files.copy(p0.toPath,
      new java.io.File(dir2, "report 100%.parquet").toPath)
    val rows2 = Seq(
      Row(Row("report 100%.parquet", Map.empty[String, String],
        p0.length(), 0L, true), null),
      Row(null, Row("dfi", schemaString, Seq.empty[String],
        Map.empty[String, String])))
    val log2 = new java.io.File(dir2, "_delta_log"); log2.mkdirs()
    val cpStage2 = tmp("dl-dfi-cp")
    spark.createDataFrame(spark.sparkContext.parallelize(rows2, 1), cpT)
      .coalesce(1).write.mode("overwrite").parquet(cpStage2)
    val cpPart2 = new java.io.File(cpStage2).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(cpPart2.toPath, new java.io.File(log2,
      f"${0L}%020d.checkpoint.parquet").toPath)
    java.nio.file.Files.write(new java.io.File(log2,
      f"${0L}%020d.json").toPath, "\n".getBytes("UTF-8"))
    spark.conf.set("spark.graft.adopt.sidecarThreshold", "1")
    try {
      val t2 = DeltaLite.convertFromDelta(spark, dir2,
        tmp("dl-dfi-root"))
      assert(t2.read().count() == 1,
        "an un-encoded literal-% path must adopt verbatim")
      assert(t2.liveFiles().head.endsWith("report 100%.parquet"),
        t2.liveFiles().toString)
    } finally spark.conf.unset("spark.graft.adopt.sidecarThreshold")
  }
}
