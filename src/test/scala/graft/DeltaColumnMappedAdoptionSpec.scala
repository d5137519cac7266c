package graft

import graft.etl.{DeltaInterop, DeltaLite}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** ADOPTING column-mapped Delta tables (delta.columnMapping.mode =
  * name/id): the parquet columns carry stable PHYSICAL names
  * ("col-<uuid>") while the schemaString carries logical names with
  * physicalName metadata — the translation lands as DeltaLite's own
  * logical→physical mapping, so a renamed-column history migrates
  * metadata-only and later renames compose on it.
  */
class DeltaColumnMappedAdoptionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def mappedField(logical: String, dt: DataType, id: Int,
      phys: String): StructField =
    StructField(logical, dt, nullable = true,
      metadata = Metadata.fromJson(
        s"""{"delta.columnMapping.id":$id,""" +
          s""""delta.columnMapping.physicalName":"$phys"}"""))

  /** A name-mapped table whose HISTORY renamed logical `b` → `amount`
    * mid-stream (same physical column). Data files carry columns
    * (col-1, col-2); k 1..10 in one file, 11..20 in a second added at
    * v1 together with the rename. Returns the stats each file records
    * (physical-keyed, as delta writes them).
    */
  private def mappedFixture(dir: String, mode: String = "name"): Unit = {
    def land(range: Range): (String, Long) = {
      val stage = s"$dir-stage-${range.head}"
      range.map(k => (k.toLong, k.toDouble * 10))
        .toDF("col-1", "col-2").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dir, part.getName)
      java.nio.file.Files.createDirectories(dst.toPath.getParent)
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      (part.getName, dst.length())
    }
    val (f1, s1) = land(1 to 10)
    val (f2, s2) = land(11 to 20)
    def metaJson(schema: StructType): String = {
      val esc = schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
      s"""{"metaData":{"id":"cmfix","format":{"provider":"parquet"},""" +
        s""""schemaString":"$esc","partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"$mode",""" +
        s""""delta.columnMapping.maxColumnId":"2"}}}"""
    }
    val schemaV0 = StructType(Seq(
      mappedField("k", LongType, 1, "col-1"),
      mappedField("b", DoubleType, 2, "col-2")))
    val schemaV1 = StructType(Seq(
      mappedField("k", LongType, 1, "col-1"),
      mappedField("amount", DoubleType, 2, "col-2")))
    // physical-keyed stats, the form delta writers record under mapping
    def st(lo: Long, hi: Long): String =
      s"""{\\"numRecords\\":10,\\"minValues\\":{\\"col-1\\":$lo},""" +
        s"""\\"maxValues\\":{\\"col-1\\":$hi}}"""
    def add(name: String, size: Long, lo: Long, hi: Long): String =
      s"""{"add":{"path":"$name","partitionValues":{},"size":$size,""" +
        s""""modificationTime":0,"dataChange":true,"stats":"${st(lo, hi)}"}}"""
    val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(log, f"${0L}%020d.json").toPath,
      (s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""" +
        "\n" + metaJson(schemaV0) + "\n" +
        add(f1, s1, 1, 10) + "\n").getBytes("UTF-8"))
    java.nio.file.Files.write(
      new java.io.File(log, f"${1L}%020d.json").toPath,
      (metaJson(schemaV1) + "\n" +
        add(f2, s2, 11, 20) + "\n").getBytes("UTF-8"))
  }

  test("a name-mapped table with a mid-history rename adopts and reads LOGICAL names; stats prune through the mapping") {
    val dir = tmp("cm-adopt-src")
    mappedFixture(dir)
    // direct read serves the FINAL logical names over physical bytes
    val direct = DeltaInterop.readDelta(spark, dir)
    assert(direct.schema.fieldNames.toSeq == Seq("k", "amount"),
      direct.schema.treeString)
    assert(direct.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      == (1L to 20L).map(k => k -> k * 10.0).toMap)
    // the delta metadata keys are SCRUBBED from the adopted schema
    assert(!direct.schema.fields.exists(
      _.metadata.contains("delta.columnMapping.physicalName")))
    val t = DeltaLite.convertFromDelta(spark, dir, tmp("cm-adopt-root"),
      statsKey = Some("k"))
    assert(t.schema.get.fieldNames.toSeq == Seq("k", "amount"))
    assert(t.columnMapping == Map("k" -> "col-1", "amount" -> "col-2"),
      t.columnMapping.toString)
    val got = t.read().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == (1L to 20L).map(k => k -> k * 10.0).toMap)
    assert(t.readIndexed().collect().map(r =>
      r.getLong(0) -> r.getDouble(1)).toMap == got)
    // the PHYSICAL-keyed source stats adopted under the logical key:
    // a point upsert into file 2's range leaves file 1 untouched
    val before = t.liveFiles().toSet
    t.upsert(Seq((15L, 999.0)).toDF("k", "amount"), "k")
    val after = t.liveFiles().toSet
    assert((before intersect after).size == 1,
      s"adopted mapped stats must prune the upsert: $before -> $after")
    assert(t.read().filter(col("k") === 15L).head().getDouble(1) == 999.0)
    // deleteWhere speaks logical names over the mapped files
    t.deleteWhere(col("amount") === 30.0)
    assert(!t.read().select("k").collect().map(_.getLong(0)).contains(3L))
  }

  test("id-mode adopts by physicalName (delta-spark writes physical parquet columns in both modes)") {
    val dir = tmp("cm-id-src")
    mappedFixture(dir, mode = "id")
    val t = DeltaLite.convertFromDelta(spark, dir, tmp("cm-id-root"))
    assert(t.read().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      == (1L to 20L).map(k => k -> k * 10.0).toMap)
  }

  test("a LATER DeltaLite rename onto another column's physical name stays correct — resolution is by stable id") {
    val dir = tmp("cm-swap-src")
    mappedFixture(dir)
    val t = DeltaLite.convertFromDelta(spark, dir, tmp("cm-swap-root"))
    // rename logical `amount` to `col-1` — the OTHER column's physical
    // name. Reads must keep resolving through the mapping (k -> col-1
    // bytes, col-1 -> col-2 bytes), never by raw name collision.
    t.renameColumn("amount", "col-1-renamed")
    t.renameColumn("k", "k2")
    assert(t.read().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      == (1L to 20L).map(k => k -> k * 10.0).toMap)
    assert(t.schema.get.fieldNames.toSeq == Seq("k2", "col-1-renamed"))
    // the adversarial case: rename onto the literal physical name of
    // the sibling column
    t.renameColumn("col-1-renamed", "col-1")
    val sch = t.schema.get.fieldNames.toSeq
    assert(sch == Seq("k2", "col-1"), sch.toString)
    val rows = t.read().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows == (1L to 20L).map(k => k -> k * 10.0).toMap,
      "physical-name collision corrupted resolution")
    // appends through the mapping land physical columns; reads compose
    t.append(Seq((21L, 210.0)).toDF("k2", "col-1"))
    assert(t.read().count() == 21)
    assert(t.read().filter(col("k2") === 21L).head().getDouble(1) == 210.0)
  }

  test("nested mapped columns and missing physicalName refuse loudly") {
    val dir = tmp("cm-nested-src")
    // build a log whose schema carries a mapped NESTED struct
    val nestedSchema = StructType(Seq(
      mappedField("k", LongType, 1, "col-1"),
      StructField("s", StructType(Seq(StructField("x", LongType))),
        nullable = true, metadata = Metadata.fromJson(
          """{"delta.columnMapping.id":2,""" +
            """"delta.columnMapping.physicalName":"col-2"}"""))))
    val esc = nestedSchema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(log, f"${0L}%020d.json").toPath,
      (s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""" +
        "\n" +
        s"""{"metaData":{"id":"x","format":{"provider":"parquet"},""" +
        s""""schemaString":"$esc","partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"name"}}}""" +
        "\n" +
        """{"add":{"path":"f.parquet","partitionValues":{},"size":1,""" +
        """"modificationTime":0,"dataChange":true}}""" + "\n")
        .getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](
      DeltaInterop.snapshot(spark, dir))
    assert(e.getMessage.contains("NESTED"), e.getMessage)
    // missing physicalName names the column
    val dir2 = tmp("cm-miss-src")
    val missSchema = StructType(Seq(
      mappedField("k", LongType, 1, "col-1"),
      StructField("v", StringType)))
    val esc2 = missSchema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    val log2 = new java.io.File(dir2, "_delta_log"); log2.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(log2, f"${0L}%020d.json").toPath,
      (s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""" +
        "\n" +
        s"""{"metaData":{"id":"x","format":{"provider":"parquet"},""" +
        s""""schemaString":"$esc2","partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"name"}}}""" +
        "\n" +
        """{"add":{"path":"f.parquet","partitionValues":{},"size":1,""" +
        """"modificationTime":0,"dataChange":true}}""" + "\n")
        .getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException](
      DeltaInterop.snapshot(spark, dir2))
    assert(e2.getMessage.contains("'v'"), e2.getMessage)
  }

  test("a PARTITIONED mapped source translates physical-keyed partitionValues and injects logical columns") {
    val dir = tmp("cm-part-src")
    // data files carry only col-1 (the k bytes); the partition column
    // `region` (physical col-2) lives in the log, keyed PHYSICAL in
    // partitionValues as delta writes it
    def land(range: Range): (String, Long) = {
      val stage = s"$dir-stage-${range.head}"
      range.map(k => Tuple1(k.toLong)).toDF("col-1").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dir, part.getName)
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      (part.getName, dst.length())
    }
    val (fE, sE) = land(1 to 5)
    val (fW, sW) = land(6 to 9)
    val schema = StructType(Seq(
      mappedField("k", LongType, 1, "col-1"),
      mappedField("region", StringType, 2, "col-2")))
    val esc = schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
    def add(n: String, s0: Long, region: String): String =
      s"""{"add":{"path":"$n","partitionValues":{"col-2":"$region"},""" +
        s""""size":$s0,"modificationTime":0,"dataChange":true}}"""
    java.nio.file.Files.write(
      new java.io.File(log, f"${0L}%020d.json").toPath,
      (s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""" +
        "\n" +
        s"""{"metaData":{"id":"x","format":{"provider":"parquet"},""" +
        s""""schemaString":"$esc","partitionColumns":["region"],""" +
        s""""configuration":{"delta.columnMapping.mode":"name"}}}""" +
        "\n" + add(fE, sE, "east") + "\n" + add(fW, sW, "west") + "\n")
        .getBytes("UTF-8"))
    val direct = DeltaInterop.readDelta(spark, dir)
      .filter(col("region") === "east")
    assert(direct.select("k").collect().map(_.getLong(0)).toSet ==
      (1L to 5L).toSet, "mapped partition injection diverged")
    val t = DeltaLite.convertFromDelta(spark, dir, tmp("cm-part-root"))
    val got = t.read().filter(col("region") === "west")
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got == (6L to 9L).toSet,
      s"adopted mapped partition filter diverged: $got")
  }

  test("a checkpoint-backed MAPPED source adopts DF-NATIVELY: physical stats/partitionValues resolve in the relabel, fold parity") {
    val dir = tmp("cm-df-src")
    // data files carry only col-1 bytes; partition col-2 in the log
    def land(range: Range): (String, Long) = {
      val stage = s"$dir-stage-${range.head}"
      range.map(k => Tuple1(k.toLong)).toDF("col-1").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dir, part.getName)
      java.nio.file.Files.createDirectories(dst.toPath.getParent)
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      (part.getName, dst.length())
    }
    val (fE, sE) = land(1 to 5)
    val (fW, sW) = land(6 to 9)
    val schema = StructType(Seq(
      mappedField("k", LongType, 1, "col-1"),
      mappedField("region", StringType, 2, "col-2")))
    val cpT = StructType(Seq(
      StructField("add", StructType.fromDDL(
        "path string, partitionValues map<string,string>, size long, " +
          "modificationTime long, dataChange boolean, stats string")),
      StructField("metaData", StructType.fromDDL(
        "id string, schemaString string, " +
          "partitionColumns array<string>, " +
          "configuration map<string,string>"))))
    // PHYSICAL-keyed stats and partitionValues, as delta writes them
    def addRow(n: String, sz: Long, region: String, lo: Long,
        hi: Long): org.apache.spark.sql.Row =
      org.apache.spark.sql.Row(org.apache.spark.sql.Row(n,
        Map("col-2" -> region), sz, 0L, true,
        s"""{"numRecords":${hi - lo + 1},""" +
          s""""minValues":{"col-1":$lo},"maxValues":{"col-1":$hi}}"""),
        null)
    val rows = Seq(
      addRow(fE, sE, "east", 1L, 5L),
      addRow(fW, sW, "west", 6L, 9L),
      org.apache.spark.sql.Row(null, org.apache.spark.sql.Row(
        "cm-df", schema.json, Seq("region"),
        Map("delta.columnMapping.mode" -> "name"))))
    val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
    val cpStage = tmp("cm-df-cp")
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), cpT)
      .coalesce(1).write.mode("overwrite").parquet(cpStage)
    val cpPart = new java.io.File(cpStage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(cpPart.toPath, new java.io.File(log,
      f"${0L}%020d.checkpoint.parquet").toPath)
    java.nio.file.Files.write(new java.io.File(log,
      f"${0L}%020d.json").toPath, "\n".getBytes("UTF-8"))
    spark.conf.set("spark.graft.adopt.sidecarThreshold", "1")
    try {
      val t = DeltaLite.convertFromDelta(spark, dir, tmp("cm-df-root"),
        statsKey = Some("k"))
      assert(t.jsonEntriesRendered.get() == 0,
        "a mapped source must stay DF-native")
      assert(t.columnMapping ==
        Map("k" -> "col-1", "region" -> "col-2"))
      val got = t.read().collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == (1L to 9L).map(k =>
        k -> (if (k <= 5) "east" else "west")).toMap,
        s"DF-native mapped adoption diverged: $got")
      // adopted physical-keyed stats prune a point upsert; the
      // injected partition column filters
      val before = t.liveFiles().toSet
      t.upsert(Seq((8L, "west")).toDF("k", "region"), "k")
      assert((before intersect t.liveFiles().toSet).size == 1,
        "mapped DF-route stats must prune the upsert")
      assert(t.read().filter(col("region") === "east").count() == 5)
      // numRecords carried through the mapped relabel
      assert(t.rowCount() == Some(9L))
      // fold parity on the same source
      spark.conf.set("spark.graft.adopt.sidecarThreshold",
        Int.MaxValue.toString)
      val fold = DeltaLite.convertFromDelta(spark, dir,
        tmp("cm-df-fold"), statsKey = Some("k"))
      assert(fold.read().collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap ==
        (1L to 9L).map(k =>
          k -> (if (k <= 5) "east" else "west")).toMap)
      assert(fold.columnMapping == t.columnMapping)
    } finally spark.conf.unset("spark.graft.adopt.sidecarThreshold")
  }
}
