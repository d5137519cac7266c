package graft

import graft.etl.{DeltaDv, DeltaInterop, DeltaLite}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** ADOPTING DV-bearing Delta tables: the codec (Z85, portable
  * RoaringBitmapArray, `.bin` framing) round-trips byte-faithful
  * fixtures, and [[DeltaLite.convertFromDelta]] lands a source's
  * deletion vectors as its OWN merge-on-read sidecars — deleted rows
  * stay gone through read / readIndexed / upsert / export, on both
  * replay routes (and export publishes live masks back as REAL Delta
  * DVs). Modern Databricks runtimes write DVs by default, so this is
  * the migration path for freshly-created source tables.
  */
class DeltaDvAdoptionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // ---------- codec unit coverage ----------

  test("Z85 round-trips 4-byte groups and refuses bad lengths/chars") {
    val bytes = Array.tabulate(16)(i => (i * 37 + 11).toByte)
    val enc = DeltaDv.z85Encode(bytes)
    assert(enc.length == 20)
    assert(DeltaDv.z85Decode(enc).toSeq == bytes.toSeq)
    // the uuid path form round-trips through resolvePath
    val uuid = java.util.UUID.randomUUID()
    val p = DeltaDv.resolvePath("/t", DeltaDv.Descriptor(
      "u", DeltaDv.encodeUuidPath(uuid, "ab"), Some(1), 10, 1L)).get
    assert(p.toString == s"/t/ab/deletion_vector_$uuid.bin", p.toString)
    val noPrefix = DeltaDv.resolvePath("/t", DeltaDv.Descriptor(
      "u", DeltaDv.encodeUuidPath(uuid), Some(1), 10, 1L)).get
    assert(noPrefix.toString == s"/t/deletion_vector_$uuid.bin")
    intercept[IllegalArgumentException](DeltaDv.z85Encode(new Array[Byte](3)))
    intercept[IllegalArgumentException](DeltaDv.z85Decode("abcd"))
    intercept[IllegalArgumentException](DeltaDv.z85Decode("abcd"))
    // a 5-char group worth more than 2^32-1 is corrupt — refused at
    // the boundary, never silently truncated into plausible bytes
    val eOver = intercept[IllegalArgumentException](
      DeltaDv.z85Decode("#####"))
    assert(eOver.getMessage.contains("32 bits"), eOver.getMessage)
  }

  test("RoaringBitmapArray round-trips positions across 2^32 stripes; wrong magic refuses") {
    val pos = Array(0L, 5L, 6L, 1000000L, (1L << 32) + 3L, (3L << 32))
    val ser = DeltaDv.serializeBitmapArray(pos)
    assert(DeltaDv.deserializeBitmapArray(ser).toSeq == pos.toSeq.sorted)
    // empty stripes (key 2) serialize densely per the spec — decode
    // sees 4 bitmaps
    val bad = ser.clone(); bad(0) = 9
    val e = intercept[IllegalArgumentException](
      DeltaDv.deserializeBitmapArray(bad))
    assert(e.getMessage.contains("magic"), e.getMessage)
  }

  test("the .bin framing verifies version, declared size and CRC-32") {
    val payload = DeltaDv.serializeBitmapArray(Array(1L, 3L))
    val (fileBytes, offsets) = DeltaDv.frameDvFile(Seq(payload))
    assert(fileBytes(0) == 1.toByte && offsets == Seq(1))
    val dir = tmp("dv-frame")
    val bin = new java.io.File(dir, "deletion_vector_x.bin")
    java.nio.file.Files.write(bin.toPath, fileBytes)
    val conf = spark.sparkContext.hadoopConfiguration
    val d = DeltaDv.Descriptor("p", bin.getAbsolutePath, Some(1),
      payload.length, 2L)
    assert(DeltaDv.positions(conf, dir, d).toSeq == Seq(1L, 3L))
    // cardinality mismatch refuses (a torn mask must not half-apply)
    val e1 = intercept[IllegalArgumentException](
      DeltaDv.positions(conf, dir, d.copy(cardinality = 5L)))
    assert(e1.getMessage.contains("cardinality"), e1.getMessage)
    // corrupt one payload byte -> CRC refusal
    val corrupt = fileBytes.clone()
    corrupt(7) = (corrupt(7) ^ 0x41).toByte
    java.nio.file.Files.write(bin.toPath, corrupt)
    val e2 = intercept[IllegalArgumentException](
      DeltaDv.positions(conf, dir, d))
    assert(e2.getMessage.contains("CRC"), e2.getMessage)
    // wrong format version refuses by number
    val vbad = fileBytes.clone(); vbad(0) = 2
    java.nio.file.Files.write(bin.toPath, vbad)
    val e3 = intercept[IllegalArgumentException](
      DeltaDv.positions(conf, dir, d))
    assert(e3.getMessage.contains("version 2"), e3.getMessage)
    // inline storage decodes without touching any filesystem
    val inline = DeltaDv.Descriptor("i",
      DeltaDv.z85Encode(payload ++
        new Array[Byte]((4 - payload.length % 4) % 4)),
      None, payload.length, 2L)
    assert(DeltaDv.positions(conf, dir, inline).toSeq == Seq(1L, 3L))
  }

  // ---------- end-to-end adoption ----------

  /** Write a two-file Delta table at `dir` (k 1..10 and 11..20), with
    * a "u"-storage DV masking rows {1,3} of file A and an inline DV
    * masking row {0} of file B. Returns (fileA, fileB) names.
    */
  private def dvFixture(dir: String,
      protoLine: String =
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["deletionVectors"],""" +
          """"writerFeatures":["deletionVectors"]}}"""): (String, String) = {
    def land(range: Range, tag: String): String = {
      val stage = s"$dir-stage-$tag"
      range.map(k => (k.toLong, s"r$k")).toDF("k", "v").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dir, part.getName)
      java.nio.file.Files.createDirectories(dst.toPath.getParent)
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      part.getName
    }
    val fa = land(1 to 10, "a")
    val fb = land(11 to 20, "b")
    // file A: rows at positions 0 and 2 (k=1, k=3) via a .bin sidecar
    val payloadA = DeltaDv.serializeBitmapArray(Array(0L, 2L))
    val (binBytes, offs) = DeltaDv.frameDvFile(Seq(payloadA))
    val uuid = java.util.UUID.randomUUID()
    java.nio.file.Files.write(
      new java.io.File(dir, s"deletion_vector_$uuid.bin").toPath, binBytes)
    val dvA = s"""{"storageType":"u","pathOrInlineDv":"${
      DeltaDv.encodeUuidPath(uuid)}","offset":${offs.head},""" +
      s""""sizeInBytes":${payloadA.length},"cardinality":2}"""
    // file B: position 0 (k=11) inline
    val payloadB = DeltaDv.serializeBitmapArray(Array(0L))
    val padB = payloadB ++ new Array[Byte]((4 - payloadB.length % 4) % 4)
    val dvB = s"""{"storageType":"i","pathOrInlineDv":"${
      DeltaDv.z85Encode(padB)}","sizeInBytes":${payloadB.length},""" +
      """"cardinality":1}"""
    val schemaJson = org.apache.spark.sql.types.StructType.fromDDL(
      "k bigint, v string").json.replace("\\", "\\\\").replace("\"", "\\\"")
    def sz(n: String) = new java.io.File(dir, n).length()
    val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(log, f"${0L}%020d.json").toPath,
      (protoLine + "\n" +
        s"""{"metaData":{"id":"dvfix","format":{"provider":"parquet"},""" +
        s""""schemaString":"$schemaJson","partitionColumns":[],""" +
        s""""configuration":{}}}""" + "\n" +
        s"""{"add":{"path":"$fa","partitionValues":{},"size":${sz(fa)},""" +
        s""""modificationTime":0,"dataChange":true,""" +
        s""""deletionVector":$dvA}}""" + "\n" +
        s"""{"add":{"path":"$fb","partitionValues":{},"size":${sz(fb)},""" +
        s""""modificationTime":0,"dataChange":true,""" +
        s""""deletionVector":$dvB}}""" + "\n").getBytes("UTF-8"))
    (fa, fb)
  }

  test("a DV-bearing Delta table adopts with the deleted rows GONE through read/readIndexed/upsert; export round-trips the masks") {
    val dir = tmp("dv-adopt-src")
    dvFixture(dir)
    // readDelta (the read-only path) already masks
    val direct = DeltaInterop.readDelta(spark, dir)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(direct == ((1L to 20L).toSet -- Set(1L, 3L, 11L)),
      s"readDelta mask diverged: ${direct.toSeq.sorted}")
    val t = DeltaLite.convertFromDelta(spark, dir, tmp("dv-adopt-root"),
      statsKey = Some("k"))
    val expect = (1L to 20L).toSet -- Set(1L, 3L, 11L)
    assert(t.read().select("k").collect().map(_.getLong(0)).toSet == expect)
    assert(t.readIndexed().select("k").collect()
      .map(_.getLong(0)).toSet == expect,
      "readIndexed resurrected DV-masked rows")
    // a rewrite (upsert) folds the mask rather than resurrecting
    t.upsert(Seq((5L, "updated")).toDF("k", "v"), "k")
    val afterUp = t.read().collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(afterUp.keySet == expect && afterUp(5L) == "updated",
      s"upsert resurrected masked rows: ${afterUp.keySet -- expect}")
    // EXPORT with live DVs: the masks publish as REAL Delta DVs (the
    // full circle — the upsert above already folded most, any
    // remaining mask exports as a descriptor) and our own Delta
    // reader serves the identical row set
    t.exportToDelta()
    val re = DeltaInterop.readDelta(spark, t.root)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(re == expect, "DV export round trip diverged")
  }

  test("tail DV semantics: a re-add with a DV masks, a later re-add without one clears — latest add wins") {
    val dir = tmp("dv-tail-src")
    val (fa, _) = dvFixture(dir)
    // v1 re-adds file A WITHOUT its DV (a source-side materialize
    // rewrote nothing but cleared the mask): k=1,3 come back
    def sz(n: String) = new java.io.File(dir, n).length()
    java.nio.file.Files.write(
      new java.io.File(s"$dir/_delta_log", f"${1L}%020d.json").toPath,
      (s"""{"add":{"path":"$fa","partitionValues":{},"size":${sz(fa)},""" +
        s""""modificationTime":0,"dataChange":false}}""" + "\n")
        .getBytes("UTF-8"))
    val t = DeltaLite.convertFromDelta(spark, dir, tmp("dv-tail-root"))
    assert(t.read().select("k").collect().map(_.getLong(0)).toSet ==
      ((1L to 20L).toSet - 11L),
      "a DV-less re-add must clear the earlier mask")
    // adopting AS OF v0 still sees the masked snapshot
    val t0 = DeltaLite.convertFromDelta(spark, dir, tmp("dv-tail-v0"),
      versionAsOf = Some(0L))
    assert(t0.read().select("k").collect().map(_.getLong(0)).toSet ==
      ((1L to 20L).toSet -- Set(1L, 3L, 11L)))
  }

  test("DF-native route adopts checkpoint DVs: descriptors driver-side, positions decoded distributed, jsonEntriesRendered stays 0") {
    val dir = tmp("dv-df-src")
    val (fa, fb) = dvFixture(dir)
    // build a v0 checkpoint equivalent to the JSON commit, with the
    // deletionVector struct on the DV'd adds
    def sz(n: String) = new java.io.File(dir, n).length()
    val payloadA = { // regenerate descriptor fields from the fixture log
      val src = scala.io.Source.fromFile(
        new java.io.File(s"$dir/_delta_log", f"${0L}%020d.json"))
      try src.getLines().toList finally src.close()
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val adds = payloadA.filter(_.contains("\"add\""))
      .map(mapper.readTree(_).path("add"))
    val metaNode = payloadA.filter(_.contains("metaData"))
      .map(mapper.readTree(_).path("metaData")).head
    val addDf = adds.map { a =>
      val dv = a.path("deletionVector")
      (a.path("path").asText(), a.path("size").asLong(),
        dv.path("storageType").asText(), dv.path("pathOrInlineDv").asText(),
        if (dv.has("offset")) dv.path("offset").asInt() else -1,
        dv.path("sizeInBytes").asInt(), dv.path("cardinality").asLong())
    }.toDF("path", "size", "st", "pidv", "off", "sib", "card")
      .selectExpr(
        """named_struct(
           'path', path, 'partitionValues', map(), 'size', size,
           'modificationTime', 0L, 'dataChange', true,
           'stats', cast(null as string),
           'deletionVector', named_struct(
             'storageType', st, 'pathOrInlineDv', pidv,
             'offset', case when off >= 0 then off end,
             'sizeInBytes', sib, 'cardinality', card)) as add""",
        "cast(null as string) as dummy")
    val metaDf = Seq((metaNode.path("id").asText(),
      metaNode.path("schemaString").asText())).toDF("id", "schemaString")
      .selectExpr(
        """named_struct('id', id, 'format',
             named_struct('provider', 'parquet'),
             'schemaString', schemaString,
             'partitionColumns', array(),
             'configuration', map()) as metaData""")
    val cpStage = tmp("dv-df-cp")
    addDf.selectExpr("add", "cast(null as struct<id:string>) as metaData")
      .unionByName(metaDf.selectExpr(
        "cast(null as struct<path:string>) as add", "metaData"),
        allowMissingColumns = true)
      .coalesce(1).write.mode("overwrite").parquet(cpStage)
    val part = new java.io.File(cpStage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath, new java.io.File(
      s"$dir/_delta_log", f"${0L}%020d.checkpoint.parquet").toPath)
    val prior = spark.conf.getOption("spark.graft.adopt.sidecarThreshold")
    spark.conf.set("spark.graft.adopt.sidecarThreshold", "1")
    try {
      val t = DeltaLite.convertFromDelta(spark, dir, tmp("dv-df-root"))
      // FILE entries stay in the parquet sidecar (0 rendered); the DV
      // sidecar PATH list is the only JSON-rendered set and is bounded
      // by the decode job's slice cap (<=256 paths), never O(live) —
      // here 2 descriptors decode into at most 2 sidecar files
      assert(t.jsonEntriesRendered.get() <= 2,
        s"DF route rendered ${t.jsonEntriesRendered.get()} driver-side " +
          "entries — the live file set must stay in the parquet sidecar")
      val expect = (1L to 20L).toSet -- Set(1L, 3L, 11L)
      assert(t.read().select("k").collect().map(_.getLong(0)).toSet ==
        expect, "DF-route adopted DVs diverged")
      assert(t.readIndexed().select("k").collect()
        .map(_.getLong(0)).toSet == expect)
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.graft.adopt.sidecarThreshold", v)
        case None => spark.conf.unset("spark.graft.adopt.sidecarThreshold")
      }
    }
  }

  test("an unknown reader feature still refuses by name; deletionVectors alone is supported") {
    val dir = tmp("dv-feat-src")
    dvFixture(dir, protoLine =
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors","v2Checkpoint"],""" +
        """"writerFeatures":["deletionVectors"]}}""")
    val e = intercept[IllegalArgumentException](
      DeltaLite.convertFromDelta(spark, dir, tmp("dv-feat-root")))
    assert(e.getMessage.contains("v2Checkpoint") &&
      !e.getMessage.contains("deletionVectors,"), e.getMessage)
  }
}
