package graft

import graft.etl.{DeltaInterop, DeltaLite}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

import java.nio.file.Files

/** Adoption of PARTITIONED Delta tables ([[DeltaLite.convertFromDelta]]
  * on a source whose partition column bytes live only in the log —
  * Delta's physical layout). The adopted table records each file's
  * partition values as [v,v] extras plus the `valuesInLog` property;
  * every read path injects the columns through a partition-schema'd
  * FileIndex, partition filters eliminate files natively, and the
  * write verbs (upsert/update/delete/append/compact) stay
  * file-granular. Per-commit LEAF reads (streaming tails, change
  * feed) refuse loudly across the byte-less adoption commit.
  */
class DeltaLitePartitionedAdoptionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** A faithful partitioned Delta source: hive-laid files carrying
    * ONLY (k, v) under region=<r>/ dirs, values in the log. Two
    * partitions x two files. Returns (dir, file names by region).
    */
  private def partitionedSource(): (String, Map[String, Seq[String]]) = {
    val dir = tmp("dl-part-src")
    def landIn(region: String, rows: Seq[(Long, String)]): String = {
      new java.io.File(dir, s"region=$region").mkdirs()
      val stage = tmp("dl-part-stage")
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(s"$dir/region=$region", part.getName).toPath)
      s"region=$region/${part.getName}"
    }
    val e1 = landIn("east", (1L to 5L).map(k => (k, s"e$k")))
    val e2 = landIn("east", (6L to 10L).map(k => (k, s"e$k")))
    val w1 = landIn("west", (11L to 15L).map(k => (k, s"w$k")))
    val w2 = landIn("west", (16L to 20L).map(k => (k, s"w$k")))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k bigint, v string, region string").json
    val meta = {
      val root = mapper.createObjectNode()
      val m = root.putObject("metaData")
      m.put("id", "dl-part-fixture")
      m.putObject("format").put("provider", "parquet")
      m.put("schemaString", schema)
      m.putArray("partitionColumns").add("region")
      m.putObject("configuration")
      mapper.writeValueAsString(root)
    }
    def add(name: String, region: String,
        kLo: Long, kHi: Long): String = {
      val root = mapper.createObjectNode()
      val a = root.putObject("add")
      a.put("path", name)
      a.putObject("partitionValues").put("region", region)
      a.put("size", new java.io.File(dir, name).length())
      a.put("modificationTime", 0L); a.put("dataChange", true)
      a.put("stats",
        s"""{"numRecords":5,"minValues":{"k":$kLo},"maxValues":{"k":$kHi}}""")
      mapper.writeValueAsString(root)
    }
    val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(log, f"${0L}%020d.json").toPath,
      (Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        meta, add(e1, "east", 1, 5), add(e2, "east", 6, 10),
        add(w1, "west", 11, 15), add(w2, "west", 16, 20))
        .mkString("\n") + "\n")
        .getBytes("UTF-8"))
    (dir, Map("east" -> Seq(e1, e2), "west" -> Seq(w1, w2)))
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case q: QueryStageExec => scans(q.plan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
    }.flatten
    scans(df.queryExecution.executedPlan).head
  }

  test("adopts a partitioned Delta table: read matches readDelta, typed injection, declared order") {
    val (dir, _) = partitionedSource()
    val t = DeltaLite.convertFromDelta(spark, dir, tmp("dl-part-root"))
    val got = t.read()
    assert(got.schema.fieldNames.toSeq == Seq("k", "v", "region"))
    val want = DeltaInterop.readDelta(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet == want)
    assert(want.size == 20 && want.contains((1L, "e1", "east")) &&
      want.contains((20L, "w20", "west")))
    // SHOW PARTITIONS resolves through the log, not __p_ paths
    assert(t.livePartitionValues().map(_.toMap.apply("region")).toSet ==
      Set("east", "west"))
  }

  test("a partition filter plans ONLY the matching partition's files (FileSourceScan numFiles)") {
    val (dir, _) = partitionedSource()
    val t = DeltaLite.convertFromDelta(spark, dir, tmp("dl-part-root2"))
    val q = t.readIndexed().filter(col("region") === "east")
    assert(q.collect().length == 10) // q's own plan runs -> metrics
    assert(scanOf(q).metrics("numFiles").value == 2,
      s"east filter must plan 2 of 4 files, got " +
        s"${scanOf(q).metrics("numFiles").value}")
    // read() injects too (plain snapshot path)
    assert(t.read().filter(col("region") === "west").count() == 10)
  }

  test("updateWhere on a partition predicate rewrites ONLY that partition's files") {
    val (dir, files) = partitionedSource()
    val t = DeltaLite.convertFromDelta(spark, dir, tmp("dl-part-root3"))
    val westNames = files("west").map(n =>
      new org.apache.hadoop.fs.Path(s"$dir/$n").getName).toSet
    t.updateWhere(col("region") === "east",
      Seq("v" -> concat(col("v"), lit("!"))))
    val liveNames = t.liveFiles().map(p =>
      new org.apache.hadoop.fs.Path(p).getName).toSet
    // west's ADOPTED files survive untouched; east's were rewritten
    assert(westNames.subsetOf(liveNames),
      s"west files must survive an east update: $liveNames")
    assert(files("east").forall(n =>
      !liveNames.contains(new org.apache.hadoop.fs.Path(s"$dir/$n").getName)),
      "east files must be rewritten")
    val got = t.read().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.filter(_._3 == "east").forall(_._2.endsWith("!")))
    assert(got.filter(_._3 == "west").forall(!_._2.endsWith("!")))
    // rewritten rows carried their injected partition value into bytes
    assert(got.count(_._3 == "east") == 10 && got.length == 20)
  }

  test("upsert stays file-granular through adopted per-file stats; deleteWhere masks adopted rows") {
    val (dir, files) = partitionedSource()
    val t = DeltaLite.convertFromDelta(spark, dir, tmp("dl-part-root4"),
      statsKey = Some("k"))
    // merge-on-read DELETE against adopted byte-less files: the DV
    // anti-join addresses (file, pos) on the INJECTED relation
    t.deleteWhere(col("k") === 3L)
    val after = t.read().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(after.size == 19 && !after.exists(_._1 == 3L))
    assert(after.contains((4L, "e4", "east")), s"injection broke: $after")
    // upsert one west row: east's adopted files must NOT rewrite
    val eastNames = files("east").map(n =>
      new org.apache.hadoop.fs.Path(s"$dir/$n").getName).toSet
    t.upsert(Seq((16L, "updated", "west")).toDF("k", "v", "region"), "k")
    val liveNames = t.liveFiles().map(p =>
      new org.apache.hadoop.fs.Path(p).getName).toSet
    assert(eastNames.subsetOf(liveNames),
      "a west upsert must not rewrite east's adopted files")
    val got = t.read().collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(16L) == "updated" && got.size == 19)
  }

  test("appends mix native (byte-carrying) and adopted files; restats preserves the injected values") {
    val (dir, _) = partitionedSource()
    val t = DeltaLite.convertFromDelta(spark, dir, tmp("dl-part-root5"))
    t.append(Seq((21L, "n21", "north"), (22L, "n22", "north"))
      .toDF("k", "v", "region"))
    assert(t.read().count() == 22)
    assert(t.read().filter(col("region") === "north").count() == 2)
    // multi-key ANALYZE must not wipe the partition-value extras
    t.restats(Seq("k", "v"))
    val got = t.read().filter(col("region") === "east").collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(got.length == 10 && got.forall(_._2 == "east"),
      s"restats wiped the injected partition values: ${got.take(3).toSeq}")
    // and the fresh k-stats prune alongside partition pruning
    val q = t.readIndexed()
      .filter(col("region") === "east" && col("k") === 2L)
    assert(q.collect().length == 1)
    assert(scanOf(q).metrics("numFiles").value == 1,
      "partition + stats pruning must plan one file")
    // analyzing a partition column itself refuses (values already exact)
    val e = intercept[IllegalArgumentException](t.restats(Seq("region")))
    assert(e.getMessage.contains("partition column"), e.getMessage)
  }

  test("time travel injects at historical snapshots; shallow clone carries the contract") {
    val (dir, _) = partitionedSource()
    val t = DeltaLite.convertFromDelta(spark, dir, tmp("dl-part-root6"))
    t.updateWhere(col("region") === "east", Seq("v" -> lit("X")))
    val v0 = t.readAsOf(0).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(v0.size == 20 && v0.contains((1L, "e1", "east")),
      "readAsOf must inject the adopted files' partition values")
    val clone = t.shallowCloneTo(tmp("dl-part-clone"))
    val cgot = clone.read().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val tgot = t.read().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(cgot == tgot, "clone must read identically (flag carried)")
  }

  test("per-commit leaf reads INJECT across the byte-less adoption commit — tail, CDF and incremental read serve real partition columns from v0") {
    val (dir, _) = partitionedSource()
    val t = DeltaLite.convertFromDelta(spark, dir, tmp("dl-part-root7"))
    t.append(Seq((21L, "n21", "north")).toDF("k", "v", "region"))
    // the incremental read spans the byte-less v0: its files decode
    // with the log-recorded partition values injected, not NULLs
    val tail = t.readAppendsSince(-1)
    assert(tail.count() == 21)
    assert(tail.filter(col("region").isNull).count() == 0,
      "byte-less files must inject, never serve NULL partitions")
    assert(tail.filter(col("region") === "east").count() == 10)
    assert(tail.filter(col("_commit_version") === 1).count() == 1)
    // the change feed over v0 emits the adopted rows as inserts with
    // their injected partition values
    val cdf = t.changesBetween(-1, 0)
    assert(cdf.count() == 20 &&
      cdf.filter(col("region") === "west").count() == 10)
    // a merge-on-read DELETE of adopted rows: the feed materializes
    // the deleted rows' CONTENT from byte-less files, injected
    t.deleteWhere(col("k") === 3L)
    val del = t.changesBetween(1, t.latestVersion.get)
      .filter(col("_change_type") === "delete").collect()
    assert(del.length == 1 && del.head.getAs[String]("region") == "east",
      s"deleted-row decode must inject: ${del.toSeq}")
    // compact() still materializes the bytes for a fully-native layout
    t.compact(targetBytes = 1L << 30, minFiles = 2)
    assert(t.liveFiles().forall(p => !p.contains("/region=")),
      "compact must fold adopted files into native layout")
    assert(t.read().count() == 20 &&
      t.read().filter(col("region") === "east").count() == 9)
  }

  test("DeltaLiteSource tails an adopted partitioned table FROM v0 — no compact() prerequisite, exactly-once across restart") {
    val (dir, _) = partitionedSource()
    val root = tmp("dl-part-stream")
    val t = DeltaLite.convertFromDelta(spark, dir, root)
    val ckpt = tmp("dl-part-stream-ckpt")
    val outDir = tmp("dl-part-stream-out")
    def runOnce(): Unit = {
      val q = spark.readStream.format("delta-lite")
        .option("path", root).load()
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", outDir)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    runOnce()
    val got0 = spark.read.parquet(outDir)
    assert(got0.count() == 20,
      s"the adopted v0 snapshot must stream: ${got0.count()}")
    assert(got0.filter(col("region").isNull).count() == 0 &&
      got0.filter(col("region") === "east").count() == 10,
      "streamed rows must carry injected partition values")
    // restart after a new append: exactly-once, only the delta lands
    t.append(Seq((21L, "n21", "north")).toDF("k", "v", "region"))
    runOnce()
    val got1 = spark.read.parquet(outDir)
    assert(got1.count() == 21, s"restart must deliver exactly the new " +
      s"append: ${got1.count()}")
    assert(got1.filter(col("region") === "north").count() == 1)
  }

  test("a checkpointed adopted table prunes through the LAZY partitioned index") {
    val (dir, _) = partitionedSource()
    val root = tmp("dl-part-root8")
    val t = DeltaLite.convertFromDelta(spark, dir, root)
    // cross the checkpoint cadence with small appends so the open is
    // entries-DF-backed (the lazy scan path)
    (1 to 10).foreach { i =>
      t.append(Seq((100L + i, s"n$i", "north")).toDF("k", "v", "region"))
    }
    val t2 = DeltaLite(spark, root)
    val q = t2.readIndexed().filter(col("region") === "east")
    assert(q.collect().length == 10)
    assert(scanOf(q).metrics("numFiles").value == 2,
      s"lazy partitioned index must plan east's 2 files, got " +
        s"${scanOf(q).metrics("numFiles").value}")
    // and the injected values survive the checkpoint round-trip
    assert(t2.read().filter(col("region") === "west").count() == 10)
    assert(t2.read().count() == 30)
    // the SEMI-JOIN metadata lookup (the past-isin-bound path a
    // million-file rewrite takes) resolves the same values: force it
    // and run a rewrite read end to end
    spark.conf.set("spark.graft.inject.isinLimit", "1")
    try {
      t2.upsert(Seq((5L, "joined", "east")).toDF("k", "v", "region"), "k")
      val got = t2.read().filter(col("k") === 5L).collect()
      assert(got.length == 1 && got.head.getString(1) == "joined" &&
        got.head.getString(2) == "east",
        s"join-path injection diverged: ${got.toSeq}")
    } finally spark.conf.unset("spark.graft.inject.isinLimit")
  }

  test("adopted TIMESTAMP stats prune upserts correctly across session zones") {
    def fixtureWithTs(zone: String): (String, String, String, DeltaLite) = {
      val dir = tmp(s"dl-ts-src")
      def land(rows: Seq[(Long, java.sql.Timestamp)]): String = {
        val stage = tmp("dl-ts-stage")
        rows.toDF("k", "ts").coalesce(1).write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.copy(part.toPath,
          new java.io.File(dir, part.getName).toPath)
        part.getName
      }
      def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
      // f1: Jan 1-2 UTC; f2: Jun 1-2 UTC — disjoint instant ranges
      val f1 = land(Seq((1L, ts("2024-01-01T06:30:00Z")),
        (2L, ts("2024-01-02T06:30:00Z"))))
      val f2 = land(Seq((3L, ts("2024-06-01T06:30:00Z")),
        (4L, ts("2024-06-02T06:30:00Z"))))
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "k bigint, ts timestamp").json
      val meta = {
        val root = mapper.createObjectNode()
        val m = root.putObject("metaData")
        m.put("id", "dl-ts-fixture")
        m.putObject("format").put("provider", "parquet")
        m.put("schemaString", schema)
        m.putArray("partitionColumns"); m.putObject("configuration")
        mapper.writeValueAsString(root)
      }
      def add(name: String, lo: String, hi: String): String = {
        val root = mapper.createObjectNode()
        val a = root.putObject("add")
        a.put("path", name); a.putObject("partitionValues")
        a.put("size", new java.io.File(dir, name).length())
        a.put("modificationTime", 0L); a.put("dataChange", true)
        a.put("stats", s"""{"numRecords":2,"minValues":{"ts":"$lo"},"maxValues":{"ts":"$hi"}}""")
        mapper.writeValueAsString(root)
      }
      val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(log, f"${0L}%020d.json").toPath,
        (Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
          meta,
          add(f1, "2024-01-01T06:30:00.000Z", "2024-01-02T06:30:00.000Z"),
          add(f2, "2024-06-01T06:30:00.000Z", "2024-06-02T06:30:00.000Z"))
          .mkString("\n") + "\n").getBytes("UTF-8"))
      val t = DeltaLite.convertFromDelta(spark, dir,
        tmp("dl-ts-root"), statsKey = Some("ts"))
      (dir, f1, f2, t)
    }
    // America/Los_Angeles is the zone where RAW lexical ISO-with-Z
    // would mis-order against cast-form batch bounds ("2024-..." vs
    // "2023-12-31 22:30:00"); the re-encode makes both sides the same
    // session-zone cast form
    for (zone <- Seq("UTC", "America/Los_Angeles")) {
      val prior = spark.conf.get("spark.sql.session.timeZone")
      spark.conf.set("spark.sql.session.timeZone", zone)
      try {
        val (_, f1, f2, t) = fixtureWithTs(zone)
        def tsv(s: String) =
          java.sql.Timestamp.from(java.time.Instant.parse(s))
        // a point upsert inside f2's instant range must rewrite ONLY f2
        t.upsert(Seq((3L, tsv("2024-06-01T06:30:00Z")))
          .toDF("k", "ts"), "ts")
        val liveNames = t.liveFiles().map(p =>
          new org.apache.hadoop.fs.Path(p).getName).toSet
        assert(liveNames.contains(f1),
          s"[$zone] point upsert rewrote the disjoint file — adopted " +
            "timestamp stats mis-pruned")
        assert(!liveNames.contains(f2),
          s"[$zone] the overlapping file must rewrite")
        assert(t.read().count() == 4)
      } finally spark.conf.set("spark.sql.session.timeZone", prior)
    }
  }

  test("full circle: Delta -> adopt -> re-export -> Delta, partition values preserved; versionAsOf adopts history") {
    val (dir, _) = partitionedSource()
    val root = tmp("dl-part-circle")
    val t = DeltaLite.convertFromDelta(spark, dir, root)
    t.append(Seq((21L, "n21", "north")).toDF("k", "v", "region"))
    // EXPORT the adopted table: adopted files reference the SOURCE
    // absolutely, native appends relatively; partitionValues resolve
    // from the log extras and the __p_ layout respectively
    t.exportToDelta()
    val back = DeltaInterop.readDelta(spark, root)
    assert(back.schema.fieldNames.toSeq == Seq("k", "v", "region"))
    val got = back.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val want = t.read().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == want && got.size == 21,
      s"re-exported Delta view diverged: ${got.diff(want)} / ${want.diff(got)}")
    // and the circle closes: a THIRD adoption of the re-export
    val again = DeltaLite.convertFromDelta(spark, root, tmp("dl-part-again"))
    assert(again.read().count() == 21 &&
      again.read().filter(col("region") === "east").count() == 10)
    // versionAsOf: adopting the SOURCE at v0 (before the src remove
    // fixture has none here, so use the table's own history instead)
    val v0 = DeltaInterop.readDelta(spark, dir, versionAsOf = Some(0L))
    assert(v0.count() == 20, "partitioned versionAsOf read diverged")
  }
}
