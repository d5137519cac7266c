package graft

import graft.etl.{DeltaInterop, DeltaLite}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** CONVERT FROM DELTA: zero-copy adoption of a real `_delta_log`
  * (the open Delta protocol's JSON actions + parquet checkpoints —
  * the reference project's own table format) into a DeltaLite table.
  * The fixture is synthetic but faithful: 20-digit commit names, one
  * JSON action per line, URI-relative add/remove paths, Spark
  * schemaString, checkpoint parquet with add/metaData/protocol struct
  * columns.
  */
class DeltaInteropSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** One data file per call: write a single-part parquet batch under
    * the table dir and return its relative file name.
    */
  private def dataFile(dir: String, rows: Seq[(Long, String)]): String = {
    val stage = tmp("delta-stage")
    rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val name = part.getName
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(dir, name).toPath)
    name
  }

  private def schemaString: String =
    Seq((1L, "x")).toDF("k", "v").schema.json

  private def writeCommit(dir: String, version: Long,
      lines: Seq[String]): Unit = {
    val log = new java.io.File(dir, "_delta_log")
    log.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(log, f"$version%020d.json").toPath,
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
  }

  private def metaAction(parts: Seq[String] = Nil,
      conf: Map[String, String] = Map.empty): String = {
    val root = mapper.createObjectNode()
    val m = root.putObject("metaData")
    m.put("id", "00000000-0000-0000-0000-000000000001")
    val fmt = m.putObject("format")
    fmt.put("provider", "parquet")
    m.put("schemaString", schemaString)
    val pc = m.putArray("partitionColumns")
    parts.foreach(pc.add)
    val cf = m.putObject("configuration")
    conf.foreach { case (k, v) => cf.put(k, v) }
    mapper.writeValueAsString(root)
  }

  private def protocolAction: String =
    """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""

  private def addAction(path: String, size: Long,
      dv: Boolean = false, stats: Option[String] = None): String = {
    val root = mapper.createObjectNode()
    val a = root.putObject("add")
    a.put("path", path)
    a.putObject("partitionValues")
    a.put("size", size)
    a.put("modificationTime", 1700000000000L)
    a.put("dataChange", true)
    stats.foreach(s => a.put("stats", s))
    if (dv) {
      val d = a.putObject("deletionVector")
      d.put("storageType", "u")
      d.put("pathOrInlineDv", "ab^-aqEH.-t@S}K{vb[*k^")
      d.put("offset", 4)
      d.put("sizeInBytes", 40)
      d.put("cardinality", 6)
    }
    mapper.writeValueAsString(root)
  }

  private def removeAction(path: String): String =
    s"""{"remove":{"path":"$path","deletionTimestamp":1700000000001,"dataChange":true}}"""

  /** Standard three-commit fixture: v0 adds f1, v1 adds f2+f3, v2
    * removes f2. Live at latest: f1 + f3. Returns (dir, f1, f2, f3).
    */
  private def fixture(): (String, String, String, String) = {
    val dir = tmp("delta-src")
    val f1 = dataFile(dir, (1L to 10L).map(k => (k, s"a$k")))
    val f2 = dataFile(dir, (11L to 20L).map(k => (k, s"b$k")))
    val f3 = dataFile(dir, (21L to 30L).map(k => (k, s"c$k")))
    def sz(n: String) = new java.io.File(dir, n).length()
    writeCommit(dir, 0, Seq(protocolAction, metaAction(),
      addAction(f1, sz(f1))))
    writeCommit(dir, 1, Seq(addAction(f2, sz(f2)), addAction(f3, sz(f3))))
    writeCommit(dir, 2, Seq(removeAction(f2)))
    (dir, f1, f2, f3)
  }

  test("adopts the live set of a multi-commit log with removes, byte-identical to the Delta state") {
    val (dir, f1, f2, f3) = fixture()
    val t = DeltaLite.convertFromDelta(spark, dir, tmp("delta-root"),
      statsKey = Some("k"))
    assert(t.latestVersion.contains(0))
    // zero-copy: the live files ARE the source's f1 and f3, in place
    val liveNames = t.liveFiles().map(p =>
      new org.apache.hadoop.fs.Path(p).getName).toSet
    assert(liveNames == Set(f1, f3), s"live set $liveNames")
    val got = t.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = spark.read.parquet(s"$dir/$f1", s"$dir/$f3")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want, "adopted read diverges from the Delta live set")
    assert(!got.keySet.exists(k => k >= 11L && k <= 20L),
      "rows of the removed file leaked into the adopted snapshot")
    // the adopted table is a full citizen (the ConvertSpec contract)
    t.upsert(Seq((1L, "updated"), (999L, "new")).toDF("k", "v"), "k")
    assert(t.read().count() == 21)
    assert(t.readAsOf(0).count() == 20)
    // Delta versions below the adoption point are NOT this table's
    // history — travel below v0 refuses loudly
    val e = intercept[Exception](t.readAsOf(-1))
    assert(e.isInstanceOf[IllegalArgumentException] ||
      e.isInstanceOf[IllegalStateException],
      s"travel below the adoption must refuse loudly, got $e")
    // CONVERT-then-ANALYZE: restats lights up skipping on the adopted
    // files exactly like plain convert
    t.restats("k")
    assert(t.liveFileStats().exists(_._2.isDefined))
  }

  test("versionAsOf adopts an earlier Delta snapshot; bad versions refuse") {
    val (dir, f1, f2, f3) = fixture()
    val t1 = DeltaLite.convertFromDelta(spark, dir, tmp("delta-root-v1"),
      versionAsOf = Some(1L))
    assert(t1.read().count() == 30, "version 1 must still include f2")
    val t0 = DeltaLite.convertFromDelta(spark, dir, tmp("delta-root-v0"),
      versionAsOf = Some(0L))
    assert(t0.read().count() == 10)
    val e = intercept[IllegalArgumentException](
      DeltaLite.convertFromDelta(spark, dir, tmp("delta-root-v9"),
        versionAsOf = Some(9L)))
    assert(e.getMessage.contains("latest: 2"))
  }

  test("checkpoint parquet splices the replay: JSON below it may be gone") {
    val (dir, f1, f2, f3) = fixture()
    // checkpoint at version 2 = the reconciled state (f1 + f3 live)
    def sz(n: String) = new java.io.File(dir, n).length()
    val addT = org.apache.spark.sql.types.StructType.fromDDL(
      "path string, partitionValues map<string,string>, size long, " +
        "modificationTime long, dataChange boolean")
    val metaT = org.apache.spark.sql.types.StructType.fromDDL(
      "id string, schemaString string, partitionColumns array<string>, " +
        "configuration map<string,string>")
    val protoT = org.apache.spark.sql.types.StructType.fromDDL(
      "minReaderVersion int, minWriterVersion int")
    val cpT = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("add", addT),
      org.apache.spark.sql.types.StructField("metaData", metaT),
      org.apache.spark.sql.types.StructField("protocol", protoT)))
    import org.apache.spark.sql.Row
    val rows = Seq(
      Row(null, null, Row(1, 2)),
      Row(null, Row("id-1", schemaString, Seq.empty[String],
        Map.empty[String, String]), null),
      Row(Row(f1, Map.empty[String, String], sz(f1), 1700000000000L, true),
        null, null),
      Row(Row(f3, Map.empty[String, String], sz(f3), 1700000000000L, true),
        null, null))
    // place as a single-part checkpoint file
    val cpStage = tmp("cp-out")
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), cpT)
      .coalesce(1).write.mode("overwrite").parquet(cpStage)
    val part = new java.io.File(cpStage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath, new java.io.File(
      s"$dir/_delta_log", f"${2L}%020d.checkpoint.parquet").toPath)
    // vacuum the JSON commits the checkpoint covers — and add a JSON
    // delta ABOVE it re-adding f2
    Seq(0L, 1L, 2L).foreach { v =>
      new java.io.File(s"$dir/_delta_log", f"$v%020d.json").delete()
    }
    writeCommit(dir, 3, Seq(addAction(f2, sz(f2))))
    val t = DeltaLite.convertFromDelta(spark, dir, tmp("delta-root-cp"))
    assert(t.read().count() == 30,
      "checkpoint base + JSON delta must reconstruct f1+f3+f2")
    // a version BELOW the checkpoint with its JSON gone is unreadable
    // and says so
    val e = intercept[IllegalArgumentException](
      DeltaLite.convertFromDelta(spark, dir, tmp("delta-root-cp0"),
        versionAsOf = Some(1L)))
    assert(e.getMessage.contains("missing"),
      s"must refuse the vacuumed version loudly: ${e.getMessage}")
  }

  test("malformed mapped/DV inputs refuse loudly; unknown features by name") {
    // column mapping WITHOUT physicalName metadata: the declared mode
    // promises physical resolution the schema does not deliver —
    // refuse naming the column (well-formed mapped tables ADOPT — see
    // DeltaColumnMappedAdoptionSpec)
    val dirC = tmp("delta-cm")
    val fC = dataFile(dirC, Seq((1L, "x")))
    writeCommit(dirC, 0, Seq(protocolAction,
      metaAction(conf = Map("delta.columnMapping.mode" -> "name")),
      addAction(fC, 1L)))
    val eC = intercept[IllegalArgumentException](
      DeltaLite.convertFromDelta(spark, dirC, tmp("delta-cm-root")))
    assert(eC.getMessage.contains("physicalName"), eC.getMessage)
    // a GARBAGE deletion-vector descriptor refuses at decode (the
    // fixture's pathOrInlineDv is not a valid uuid encoding) rather
    // than resurrecting the masked rows (well-formed DVs ADOPT — see
    // DeltaDvAdoptionSpec)
    val dirD = tmp("delta-dv")
    val fD = dataFile(dirD, Seq((1L, "x")))
    writeCommit(dirD, 0, Seq(protocolAction, metaAction(),
      addAction(fD, 1L, dv = true)))
    intercept[Exception](
      DeltaLite.convertFromDelta(spark, dirD, tmp("delta-dv-root"))
        .read().collect())
    // reader features beyond the base protocol
    val dirF = tmp("delta-feat")
    val fF = dataFile(dirF, Seq((1L, "x")))
    writeCommit(dirF, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint"],"writerFeatures":[]}}""",
      metaAction(), addAction(fF, 1L)))
    val eF = intercept[IllegalArgumentException](
      DeltaLite.convertFromDelta(spark, dirF, tmp("delta-feat-root")))
    assert(eF.getMessage.contains("v2Checkpoint"), eF.getMessage)
    // plain parquet (no _delta_log) refuses with the convert() pointer
    val eN = intercept[IllegalArgumentException](
      DeltaLite.convertFromDelta(spark, tmp("delta-none"),
        tmp("delta-none-root")))
    assert(eN.getMessage.contains("DeltaLite.convert"), eN.getMessage)
    // IN-PLACE adoption refused: with the source under the table root,
    // a later vacuum would reclaim the source's own data files
    val dirI = tmp("delta-inplace")
    val fI = dataFile(dirI, Seq((1L, "x")))
    writeCommit(dirI, 0, Seq(protocolAction, metaAction(),
      addAction(fI, 1L)))
    val eI = intercept[IllegalArgumentException](
      DeltaLite.convertFromDelta(spark, dirI, dirI))
    assert(eI.getMessage.contains("SIDE root"), eI.getMessage)
    val eI2 = intercept[IllegalArgumentException](
      DeltaLite.convertFromDelta(spark, dirI,
        new java.io.File(dirI).getParent))
    assert(eI2.getMessage.contains("SIDE root"), eI2.getMessage)
  }

  test("the source log's per-file stats carry through adoption: skip-ready with zero data scans, timestamps conservatively excluded") {
    val dir = tmp("delta-stats")
    val f1 = dataFile(dir, (1L to 10L).map(k => (k, s"a$k")))
    val f3 = dataFile(dir, (21L to 30L).map(k => (k, s"c$k")))
    def sz(n: String) = new java.io.File(dir, n).length()
    def st(lo: Long, hi: Long, vlo: String, vhi: String) =
      s"""{"numRecords":10,"minValues":{"k":$lo,"v":"$vlo"},""" +
        s""""maxValues":{"k":$hi,"v":"$vhi"}}"""
    writeCommit(dir, 0, Seq(protocolAction, metaAction(),
      addAction(f1, sz(f1), stats = Some(st(1, 10, "a1", "a9"))),
      addAction(f3, sz(f3), stats = Some(st(21, 30, "c21", "c30")))))
    val t = DeltaLite.convertFromDelta(spark, dir, tmp("delta-stats-root"),
      statsKey = Some("k"))
    // skip-ready WITHOUT restats: every live file carries its range
    assert(t.liveFileStats().forall(_._2.isDefined),
      "adopted stats did not land on the entries")
    // and the WRITE path trusts them: a point upsert into f3's range
    // rewrites ONLY f3 (no ranges would rewrite both files)
    t.upsert(Seq((25L, "updated")).toDF("k", "v"), "k")
    val liveNames = t.liveFiles().map(p =>
      new org.apache.hadoop.fs.Path(p).getName).toSet
    assert(liveNames.contains(f1),
      "the point upsert rewrote the disjoint file — adopted stats unused")
    assert(!liveNames.contains(f3), "the overlapping file must rewrite")
    val got = t.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(25L) == "updated" && got.size == 20 && got(1L) == "a1")
    // timestamps RE-ENCODE into the session zone's cast form (Delta
    // renders ISO-with-Z); booleans/nested stay out for restats
    val tsSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "k bigint, ts timestamp, d date, x double, s string, b boolean")
    val statsJson =
      """{"minValues":{"k":1,"ts":"2024-01-01T06:30:00.000Z",""" +
        """"d":"2024-01-01","x":1.5,"s":"ab","b":false},""" +
        """"maxValues":{"k":9,"ts":"2024-06-01T06:30:00.250Z",""" +
        """"d":"2024-03-01","x":2.5E8,"s":"zz","b":true}}"""
    val ranges = graft.etl.DeltaInterop.adoptableRanges(
      statsJson, tsSchema, "UTC")
    assert(ranges.keySet == Set("k", "ts", "d", "x", "s"),
      s"got ${ranges.keySet}")
    // the MAX bound lands ms-PADDED (+1ms): delta-spark truncates
    // timestamp stats to millisecond precision, so an exact-ms max may
    // hide sub-ms rows — .250 adopts as .251; the min needs no pad
    // (truncation only lowers it, already conservative)
    assert(ranges("ts") == ("2024-01-01 06:30:00", "2024-06-01 06:30:00.251"),
      s"UTC re-encode diverged: ${ranges("ts")}")
    // a non-UTC zone re-renders the INSTANT in that zone (the form the
    // session's cast-string compares use) — raw lexical ISO would
    // mis-order against those
    val rangesLA = graft.etl.DeltaInterop.adoptableRanges(
      statsJson, tsSchema, "America/Los_Angeles")
    assert(rangesLA("ts") ==
      ("2023-12-31 22:30:00", "2024-05-31 23:30:00.251"),
      s"LA re-encode diverged: ${rangesLA("ts")}")
    // a max bound CARRYING sub-ms digits was recorded at finer
    // precision (our own export does) — no pad, adopts exactly
    val subMs = graft.etl.DeltaInterop.adoptableRanges(
      """{"minValues":{"ts":"2024-01-01T06:30:00.000123Z"},""" +
        """"maxValues":{"ts":"2024-06-01T06:30:00.250999Z"}}""",
      tsSchema, "UTC")
    assert(subMs("ts") ==
      ("2024-01-01 06:30:00.000123", "2024-06-01 06:30:00.250999"),
      s"sub-ms bounds must adopt unpadded: ${subMs("ts")}")
    assert(ranges("x") == ("1.5", "2.5E8") && ranges("d")._1 == "2024-01-01")
    // an unparsable timestamp bound adopts nothing for that column
    assert(!graft.etl.DeltaInterop.adoptableRanges(
      """{"minValues":{"ts":"garbage"},"maxValues":{"ts":"2024-06-01T06:30:00Z"}}""",
      tsSchema, "UTC").contains("ts"))
    // malformed stats adopt nothing rather than mis-pruning
    assert(graft.etl.DeltaInterop.adoptableRanges(
      "not json", tsSchema, "UTC").isEmpty)
  }

  test("adopted timestamp bounds WIDEN to the DST-transition envelope: the 2024-11-03 LA fall-back cannot mis-prune") {
    // file bounds straddling the fall-back at 2024-11-03 09:00:00Z
    // (01:59:59 PDT -> 01:00:00 PST): instant 08:30Z renders 01:30:00
    // (PDT) and 09:30Z renders 01:30:00 (PST) — a naive per-bound
    // re-encode collapses the range to ~[01:30:00, 01:30:00.001] while
    // the file holds rows rendering at 01:45:00 (both offsets), which
    // a lexical range check would then skip. The envelope must cover
    // the whole overlap hour.
    val tsSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "ts timestamp")
    val straddle = graft.etl.DeltaInterop.adoptableRanges(
      """{"minValues":{"ts":"2024-11-03T08:30:00.000Z"},""" +
        """"maxValues":{"ts":"2024-11-03T09:30:00.000Z"}}""",
      tsSchema, "America/Los_Angeles")
    assert(straddle("ts") ==
      ("2024-11-03 01:00:00", "2024-11-03 01:59:59.999999"),
      s"fall-back envelope diverged: ${straddle("ts")}")
    // in-range rows (PDT 01:45 = 08:45Z, PST 01:45 = 09:45Z is outside
    // the file; PST 01:15 = 09:15Z) render inside the envelope
    val (lo, hi) = straddle("ts")
    Seq("2024-11-03 01:45:00", "2024-11-03 01:15:00").foreach { w =>
      assert(lo <= w && w <= hi, s"$w escaped the envelope [$lo, $hi]")
    }
    // a spring-forward GAP straddle widens symmetrically: 2024-03-10
    // 10:00:00Z jumps 01:59:59 PST -> 03:00:00 PDT; bounds 09:30Z
    // (01:30 PST) .. 10:30Z (03:30 PDT) keep their endpoint envelope
    val gap = graft.etl.DeltaInterop.adoptableRanges(
      """{"minValues":{"ts":"2024-03-10T09:30:00.000Z"},""" +
        """"maxValues":{"ts":"2024-03-10T10:30:00.000Z"}}""",
      tsSchema, "America/Los_Angeles")
    assert(gap("ts") == ("2024-03-10 01:30:00", "2024-03-10 03:30:00.001"),
      s"gap envelope diverged: ${gap("ts")}")
    // a FIXED-offset zone never widens beyond the pad
    val fixed = graft.etl.DeltaInterop.adoptableRanges(
      """{"minValues":{"ts":"2024-11-03T08:30:00.000Z"},""" +
        """"maxValues":{"ts":"2024-11-03T09:30:00.000Z"}}""",
      tsSchema, "UTC")
    assert(fixed("ts") == ("2024-11-03 08:30:00", "2024-11-03 09:30:00.001"))
  }

  test("an incomplete multi-part checkpoint refuses loudly instead of replaying a torn base") {
    val (dir, f1, f2, f3) = fixture()
    // fabricate part 1-of-2 of a checkpoint at v2 (part 2 missing),
    // then vacuum the JSON it claims to cover
    def sz(n: String) = new java.io.File(dir, n).length()
    val cpStage = tmp("cp-torn")
    Seq((f1, sz(f1))).toDF("path", "size").coalesce(1)
      .write.mode("overwrite").parquet(cpStage)
    val part = new java.io.File(cpStage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath, new java.io.File(
      s"$dir/_delta_log",
      f"${2L}%020d.checkpoint.${1}%010d.${2}%010d.parquet").toPath)
    Seq(0L, 1L, 2L).foreach { v =>
      new java.io.File(s"$dir/_delta_log", f"$v%020d.json").delete()
    }
    val e = intercept[IllegalArgumentException](
      DeltaLite.convertFromDelta(spark, dir, tmp("delta-torn-root")))
    assert(e.getMessage.contains("incomplete"), e.getMessage)
  }

  test("readDelta serves a PARTITIONED table through ONE relation: typed injection, native pruning, any layout") {
    val dir = tmp("delta-readpart")
    // LOG-ONLY layout: two partitions of (k BIGINT, v STRING, region
    // STRING) where the DATA files carry only (k, v) and sit FLAT in
    // the table dir — no hive segments; values live only in the log
    val fE = dataFile(dir, (1L to 5L).map(k => (k, s"e$k")))
    val fW = dataFile(dir, (6L to 9L).map(k => (k, s"w$k")))
    val partSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "k bigint, v string, region string").json
    val meta = {
      val root = mapper.createObjectNode()
      val m = root.putObject("metaData")
      m.put("id", "part-fixture")
      m.putObject("format").put("provider", "parquet")
      m.put("schemaString", partSchema)
      m.putArray("partitionColumns").add("region")
      m.putObject("configuration")
      mapper.writeValueAsString(root)
    }
    def addPart(name: String, region: String): String = {
      val root = mapper.createObjectNode()
      val a = root.putObject("add")
      a.put("path", name)
      val pv = a.putObject("partitionValues")
      if (region == null) pv.putNull("region") else pv.put("region", region)
      a.put("size", new java.io.File(dir, name).length())
      a.put("modificationTime", 0L); a.put("dataChange", true)
      mapper.writeValueAsString(root)
    }
    writeCommit(dir, 0, Seq(protocolAction, meta,
      addPart(fE, "east"), addPart(fW, "west")))
    val df = DeltaInterop.readDelta(spark, dir)
    assert(df.schema.fieldNames.toSeq == Seq("k", "v", "region"),
      "declared schema order must be preserved")
    // ONE scan node even for the log-only layout — the partitioned
    // FileIndex serves per-file tuples; no per-tuple union legs
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.split("Scan parquet").length - 1 == 1,
      s"log-only layout must plan a single scan:\n$plan")
    val got = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val want = ((1L to 5L).map(k => (k, s"e$k", "east")) ++
      (6L to 9L).map(k => (k, s"w$k", "west"))).toSet
    assert(got == want, s"partition injection diverged: $got")
    // a partition filter ELIMINATES the other tuple's file in the scan
    val pruned = df.filter(col("region") === "east")
    assert(pruned.collect().length == 5) // pruned's own plan runs -> metrics
    val scan = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scan.nonEmpty && scan.head.metrics("numFiles").value == 1,
      s"partition filter must plan one file, got " +
        s"${scan.map(_.metrics("numFiles").value)}")
    // a NULL partition value injects as null and filters as such
    val dirN = tmp("delta-readpart-null")
    val fN = dataFile(dirN, Seq((100L, "n")))
    val fE2 = dataFile(dirN, Seq((101L, "e")))
    new java.io.File(dirN, "_delta_log").mkdirs()
    java.nio.file.Files.write(
      new java.io.File(s"$dirN/_delta_log", f"${0L}%020d.json").toPath,
      (Seq(protocolAction, meta.replace("part-fixture", "null-fixture"),
        addPart2(dirN, fN, null), addPart2(dirN, fE2, "east"))
        .mkString("\n") + "\n").getBytes("UTF-8"))
    val dfn = DeltaInterop.readDelta(spark, dirN)
    assert(dfn.filter(col("region").isNull).collect()
      .map(_.getLong(0)).toSeq == Seq(100L))
  }

  private def addPart2(dir: String, name: String, region: String): String = {
    val root = mapper.createObjectNode()
    val a = root.putObject("add")
    a.put("path", name)
    val pv = a.putObject("partitionValues")
    if (region == null) pv.putNull("region") else pv.put("region", region)
    a.put("size", new java.io.File(dir, name).length())
    a.put("modificationTime", 0L); a.put("dataChange", true)
    mapper.writeValueAsString(root)
  }

  test("readDelta hive layout plans the same single scan; an EMPTY live set reads as an empty frame") {
    val dir = tmp("delta-hive")
    // standard Delta layout: files under region=<v>/ dirs, partition
    // bytes absent from the files, values in the log AND the path
    new java.io.File(dir, "region=east").mkdirs()
    new java.io.File(dir, "region=west").mkdirs()
    def landIn(sub: String, rows: Seq[(Long, String)]): String = {
      val stage = tmp("hive-stage")
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(s"$dir/$sub", part.getName).toPath)
      s"$sub/${part.getName}"
    }
    val fE = landIn("region=east", (1L to 5L).map(k => (k, s"e$k")))
    val fW = landIn("region=west", (6L to 9L).map(k => (k, s"w$k")))
    val partSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "k bigint, v string, region string").json
    val meta = {
      val root = mapper.createObjectNode()
      val m = root.putObject("metaData")
      m.put("id", "hive-fixture")
      m.putObject("format").put("provider", "parquet")
      m.put("schemaString", partSchema)
      m.putArray("partitionColumns").add("region")
      m.putObject("configuration")
      mapper.writeValueAsString(root)
    }
    writeCommit(dir, 0, Seq(protocolAction, meta,
      addPart2(dir, fE, "east"), addPart2(dir, fW, "west")))
    val df = DeltaInterop.readDelta(spark, dir)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.split("Scan parquet").length - 1 == 1,
      s"hive layout must plan a single scan:\n$plan")
    val got = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == ((1L to 5L).map(k => (k, s"e$k", "east")) ++
      (6L to 9L).map(k => (k, s"w$k", "west"))).toSet)
    // native partition pruning: a region filter plans one file
    val pruned = df.filter(col("region") === "east")
    assert(pruned.collect().length == 5)
    val scan = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scan.nonEmpty && scan.head.metrics("numFiles").value == 1)
    // remove everything: a fully-deleted table is a VALID readable
    // state — empty frame with the declared schema, never a refusal
    writeCommit(dir, 1, Seq(removeAction(fE), removeAction(fW)))
    val empty = DeltaInterop.readDelta(spark, dir)
    assert(empty.schema.fieldNames.toSeq == Seq("k", "v", "region"))
    assert(empty.count() == 0)
  }

  test("URI-encoded relative paths and absolute paths resolve to the same files") {
    val dir = tmp("delta-uri")
    val f1 = dataFile(dir, (1L to 5L).map(k => (k, s"a$k")))
    // encode one char of the name URI-style (Delta URL-encodes paths);
    // also reference a second file ABSOLUTELY
    val f2 = dataFile(dir, (6L to 9L).map(k => (k, s"b$k")))
    val enc = f1.replaceFirst("part", "p%61rt") // 'a' -> %61
    writeCommit(dir, 0, Seq(protocolAction, metaAction(),
      addAction(enc, new java.io.File(dir, f1).length()),
      addAction(s"$dir/$f2", new java.io.File(dir, f2).length())))
    val t = DeltaLite.convertFromDelta(spark, dir, tmp("delta-uri-root"))
    assert(t.read().count() == 9)
  }
}
