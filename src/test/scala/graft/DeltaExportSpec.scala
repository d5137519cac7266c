package graft

import graft.etl.{DeltaInterop, DeltaLite}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** EXPORT a real `_delta_log` ([[DeltaLite.exportToDelta]]) — the
  * write side of zero-copy Delta interop. The round-trip oracle is our
  * own reader: [[DeltaInterop.snapshot]] replays the exported log and
  * must see exactly the live set; [[DeltaLite.convertFromDelta]]
  * re-adopts it skip-ready (stats carried). Live deletion vectors
  * export as REAL Delta DVs; snapshot export and column mapping stay
  * loud non-goals.
  */
class DeltaExportSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def norm(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  test("export round-trips: snapshot re-adopts the byte-identical live set; re-export diffs") {
    val root = tmp("dl-export")
    val t = new DeltaLite(spark, root, Some("k"))
    t.append((1L to 10L).map(k => (k, s"a$k")).toDF("k", "v").coalesce(1))
    t.append((11L to 20L).map(k => (k, s"b$k")).toDF("k", "v").coalesce(1))
    val v0 = t.exportToDelta()
    assert(v0 == 0L)
    val snap = DeltaInterop.snapshot(spark, root)
    assert(snap.files.map(f => norm(f.path)).toSet ==
      t.liveFiles().map(norm).toSet,
      "exported live set must be byte-identical to the table's")
    assert(snap.partitionColumns.isEmpty)
    // a Delta reader's view equals the table's rows
    val got = DeltaInterop.readDelta(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == t.read().collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet && got.size == 20)
    // stats carried: the re-adopted table prunes a point upsert
    val re = DeltaLite.convertFromDelta(spark, root, tmp("dl-reimport"),
      statsKey = Some("k"))
    assert(re.liveFileStats().forall(_._2.isDefined),
      "exported stats must re-adopt skip-ready")
    val before = re.liveFiles().map(p =>
      new org.apache.hadoop.fs.Path(p).getName).toSet
    assert(before.size == 2)
    re.upsert(Seq((15L, "updated")).toDF("k", "v"), "k")
    val after = re.liveFiles().map(p =>
      new org.apache.hadoop.fs.Path(p).getName).toSet
    assert((before intersect after).size == 1,
      s"point upsert must keep the disjoint file: $before -> $after")
    assert(re.read().count() == 20)
    // RE-EXPORT after an upsert: version 1 carries the diff (removes
    // of the rewritten file, adds of the new) and replays correctly
    t.upsert(Seq((5L, "updated")).toDF("k", "v"), "k")
    val v1 = t.exportToDelta()
    assert(v1 == 1L)
    val snap1 = DeltaInterop.snapshot(spark, root)
    assert(snap1.files.map(f => norm(f.path)).toSet ==
      t.liveFiles().map(norm).toSet,
      "re-export must diff to the new live set")
    val got1 = DeltaInterop.readDelta(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got1(5L) == "updated" && got1.size == 20)
  }

  test("partitioned export: partitionValues from the hive layout, reader injects them") {
    val root = tmp("dl-export-part")
    val t = new DeltaLite(spark, root, partitionBy = Seq("etype"))
    t.append(Seq((1L, "click", 1.0), (2L, "view", 2.0), (3L, "click", 3.0))
      .toDF("id", "etype", "v"))
    t.exportToDelta()
    val snap = DeltaInterop.snapshot(spark, root)
    assert(snap.partitionColumns == Seq("etype"))
    assert(snap.files.forall(_.partitionValues.contains("etype")),
      s"every add must carry its partition value: ${snap.files}")
    val got = DeltaInterop.readDelta(spark, root)
      .select("id", "etype", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "click", 1.0), (2L, "view", 2.0),
      (3L, "click", 3.0)))
  }

  test("timestamp stats export as ISO instants and re-adopt skip-ready") {
    val root = tmp("dl-export-ts")
    val t = new DeltaLite(spark, root, Some("ts"))
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    t.append(Seq((1L, ts("2024-01-01T06:30:00Z")),
      (2L, ts("2024-01-02T06:30:00.250Z"))).toDF("k", "ts").coalesce(1))
    t.append(Seq((3L, ts("2024-06-01T06:30:00Z")),
      (4L, ts("2024-06-02T06:30:00Z"))).toDF("k", "ts").coalesce(1))
    t.exportToDelta()
    val snap = DeltaInterop.snapshot(spark, root)
    val statsSeen = snap.files.flatMap(_.stats)
    assert(statsSeen.nonEmpty && statsSeen.forall(_.contains("Z")),
      s"timestamp bounds must render as ISO instants: $statsSeen")
    val re = DeltaLite.convertFromDelta(spark, root, tmp("dl-reimport-ts"),
      statsKey = Some("ts"))
    assert(re.liveFileStats().forall(_._2.isDefined),
      "exported timestamp stats must re-adopt")
    // the re-adopted ranges prune: a June point upsert keeps the
    // January file untouched (only June's rewrites)
    val before = re.liveFiles().toSet
    assert(before.size == 2)
    re.upsert(Seq((3L, ts("2024-06-01T06:30:00Z"))).toDF("k", "ts"), "ts")
    val after = re.liveFiles().toSet
    assert((before intersect after).size == 1,
      s"January's file must survive a June point upsert: $before -> $after")
    assert(re.read().count() == 4)
  }

  test("DST-ambiguous timestamp bounds export WIDENED, never wrong") {
    // America/Los_Angeles fall-back: 2024-11-03 01:30 local occurs
    // TWICE (08:30Z as PDT, 09:30Z as PST) and both instants render
    // to the same session-zone cast form. A single-instant resolution
    // would emit a max bound an hour early and external readers would
    // prune files holding the later row; the export must take the
    // earliest candidate for min and the latest for max.
    val prior = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val root = tmp("dl-export-dst")
      val t = new DeltaLite(spark, root, Some("ts"))
      def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
      t.append(Seq((1L, ts("2024-11-03T08:30:00Z")),
        (2L, ts("2024-11-03T09:30:00Z"))).toDF("k", "ts").coalesce(1))
      t.exportToDelta()
      val st = DeltaInterop.snapshot(spark, root).files.flatMap(_.stats)
      assert(st.size == 1, s"expected one stats blob: $st")
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(st.head)
      val lo = java.time.Instant.parse(
        node.path("minValues").path("ts").asText())
      val hi = java.time.Instant.parse(
        node.path("maxValues").path("ts").asText())
      assert(!lo.isAfter(java.time.Instant.parse("2024-11-03T08:30:00Z")),
        s"min bound must cover the earlier instant: $lo")
      assert(!hi.isBefore(java.time.Instant.parse("2024-11-03T09:30:00Z")),
        s"max bound must cover the later instant: $hi")
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }

  test("vacuum refuses while the exported log references doomed files; re-export (or the break flag) unblocks") {
    val root = tmp("dl-export-vac")
    val t = new DeltaLite(spark, root, Some("k"))
    t.append((1L to 10L).map(k => (k, s"a$k")).toDF("k", "v").coalesce(1))
    t.exportToDelta()
    // the rewrite dooms the exported file at retention 1
    t.upsert(Seq((5L, "updated")).toDF("k", "v"), "k")
    val e = intercept[IllegalStateException](t.vacuum(1))
    assert(e.getMessage.contains("exported _delta_log") &&
      e.getMessage.contains("exportToDelta"), e.getMessage)
    // nothing was reclaimed: the export's readers still see v0 intact
    assert(DeltaInterop.readDelta(spark, root, versionAsOf = Some(0L))
      .count() == 10)
    // re-export diffs the removes — vacuum then reclaims cleanly
    t.exportToDelta()
    val reclaimed = t.vacuum(1)
    assert(reclaimed.nonEmpty, "re-export must unblock the vacuum")
    assert(DeltaInterop.readDelta(spark, root).count() == 10)
    // the explicit break flag opts into breaking the export instead
    val root2 = tmp("dl-export-vac2")
    val t2 = new DeltaLite(spark, root2, Some("k"))
    t2.append((1L to 5L).map(k => (k, s"x$k")).toDF("k", "v").coalesce(1))
    t2.exportToDelta()
    t2.upsert(Seq((2L, "u")).toDF("k", "v"), "k")
    spark.conf.set("spark.graft.vacuum.breakExport", "true")
    try assert(t2.vacuum(1).nonEmpty,
      "the break flag must let the vacuum proceed")
    finally spark.conf.unset("spark.graft.vacuum.breakExport")
  }

  test("timestamp_ntz export gates the protocol to (3,7) with the feature named; base tables stay (1,2)") {
    // ntz is a Delta TABLE FEATURE: publishing it under protocol(1,2)
    // is non-compliant and a strict reader may reject or misread the
    // column — the exported log must carry minReader 3 / minWriter 7
    // with timestampNtz in BOTH feature lists (the delta-spark shape)
    val root = tmp("dl-export-ntz")
    val t = new DeltaLite(spark, root)
    t.append(spark.sql(
      "SELECT 1L AS k, timestamp_ntz'2024-01-01 06:30:00' AS tn"))
    t.exportToDelta()
    def protoLine(r: String): String = {
      val src = scala.io.Source.fromFile(
        new java.io.File(s"$r/_delta_log", f"${0L}%020d.json"))
      try src.getLines().find(_.contains("protocol")).get finally src.close()
    }
    val p = protoLine(root)
    assert(p.contains("\"minReaderVersion\":3") &&
      p.contains("\"minWriterVersion\":7") &&
      p.contains("\"readerFeatures\":[\"timestampNtz\"]") &&
      p.contains("\"writerFeatures\":[\"timestampNtz\"]"), p)
    // our own adoption accepts the feature-gated log (timestampNtz is
    // in the supported reader set) and reads the ntz value intact
    val re = DeltaLite.convertFromDelta(spark, root, tmp("dl-ntz-re"))
    assert(re.read().select("tn").as[java.time.LocalDateTime].head() ==
      java.time.LocalDateTime.parse("2024-01-01T06:30:00"))
    // a plain table still publishes the base protocol
    val root2 = tmp("dl-export-base")
    val t2 = new DeltaLite(spark, root2)
    t2.append(Seq((1L, "a")).toDF("k", "v"))
    t2.exportToDelta()
    val p2 = protoLine(root2)
    assert(p2.contains("\"minReaderVersion\":1") &&
      p2.contains("\"minWriterVersion\":2"), p2)
  }

  test("CHECKPOINTED export: classic checkpoint parquet + _last_checkpoint; replay survives JSON cleanup; re-adoption goes DF-native") {
    val root = tmp("dl-export-ckpt")
    val t = new DeltaLite(spark, root, Some("k"))
    t.append((1L to 10L).map(k => (k, s"a$k")).toDF("k", "v").coalesce(1))
    t.append((11L to 20L).map(k => (k, s"b$k")).toDF("k", "v").coalesce(1))
    t.exportToDelta() // v0 plain
    t.deleteWhere(col("k") === 3L)
    val v1 = t.exportToDelta(checkpoint = true)
    assert(v1 == 1L)
    val logD = new java.io.File(s"$root/_delta_log")
    assert(logD.listFiles().exists(
      _.getName == f"${1L}%020d.checkpoint.parquet"),
      logD.listFiles().map(_.getName).toSeq.toString)
    val lc = scala.io.Source.fromFile(new java.io.File(logD,
      "_last_checkpoint"))
    try assert(lc.getLines().mkString.contains("\"version\":1"))
    finally lc.close()
    // the checkpoint carries the FULL state: adds + stats + the DV
    // descriptor; replay serves it even with every JSON version GONE
    // (a Delta reader's log cleanup)
    Seq(0L, 1L).foreach { v =>
      new java.io.File(logD, f"$v%020d.json").delete()
    }
    val snap = DeltaInterop.snapshot(spark, root)
    assert(snap.version == 1L && snap.files.size == 2)
    assert(snap.files.count(_.dv.isDefined) == 1,
      "the DV descriptor must ride the checkpoint")
    assert(DeltaInterop.readDelta(spark, root)
      .select("k").collect().map(_.getLong(0)).toSet ==
      ((1L to 20L).toSet - 3L))
    // re-adoption anchors on exactly this layout and stays DF-NATIVE
    spark.conf.set("spark.graft.adopt.sidecarThreshold", "1")
    try {
      val re = DeltaLite.convertFromDelta(spark, root,
        tmp("dl-export-ckpt-re"), statsKey = Some("k"))
      assert(re.jsonEntriesRendered.get() <= 2,
        s"checkpointed export must re-adopt DF-natively, rendered " +
          s"${re.jsonEntriesRendered.get()}")
      assert(re.read().select("k").collect().map(_.getLong(0)).toSet ==
        ((1L to 20L).toSet - 3L), "DF-native re-adoption diverged")
      // checkpoint stats carried: a point upsert prunes file-granular
      val before = re.liveFiles().toSet
      re.upsert(Seq((15L, "updated")).toDF("k", "v"), "k")
      assert((before intersect re.liveFiles().toSet).size == 1,
        "checkpointed stats must prune the re-adopted upsert")
    } finally spark.conf.unset("spark.graft.adopt.sidecarThreshold")
  }

  test("live deletion vectors EXPORT as real Delta DVs: descriptors + .bin, growth re-adds, materialize clears") {
    val rootD = tmp("dl-export-dv")
    val tD = new DeltaLite(spark, rootD)
    tD.append((1L to 10L).map(k => (k, s"a$k")).toDF("k", "v").coalesce(1))
    tD.deleteWhere(col("k") === 3L)
    // v0 export publishes the mask as a "u"-storage descriptor into a
    // .bin under the root, protocol gated to deletionVectors
    assert(tD.exportToDelta() == 0L)
    val snapD = DeltaInterop.snapshot(spark, rootD)
    val masked = snapD.files.filter(_.dv.isDefined)
    assert(masked.size == 1 && masked.head.dv.get.cardinality == 1L,
      s"expected one masked add: ${snapD.files}")
    assert(masked.head.dv.get.storageType == "u")
    assert(new java.io.File(rootD).listFiles().exists(
      _.getName.matches("deletion_vector_.*\\.bin")),
      "the .bin must land under the table root")
    assert(DeltaInterop.readDelta(spark, rootD)
      .select("k").collect().map(_.getLong(0)).toSet ==
      ((1L to 10L).toSet - 3L))
    // the stats declare wide bounds on the masked file
    assert(masked.head.stats.exists(_.contains("\"tightBounds\":false")),
      masked.head.stats.toString)
    // mask GROWTH re-exports the add with the bigger descriptor
    tD.deleteWhere(col("k") === 7L)
    assert(tD.exportToDelta() == 1L)
    val snapD2 = DeltaInterop.snapshot(spark, rootD)
    assert(snapD2.files.flatMap(_.dv).map(_.cardinality) == Seq(2L),
      snapD2.files.flatMap(_.dv).toString)
    assert(DeltaInterop.readDelta(spark, rootD)
      .select("k").collect().map(_.getLong(0)).toSet ==
      ((1L to 10L).toSet -- Set(3L, 7L)))
    // an export with UNCHANGED masks re-publishes nothing DV'd and
    // writes no new .bin
    val binsBefore = new java.io.File(rootD).listFiles()
      .count(_.getName.endsWith(".bin"))
    assert(tD.exportToDelta() == 2L)
    assert(new java.io.File(rootD).listFiles()
      .count(_.getName.endsWith(".bin")) == binsBefore,
      "unchanged masks must not write a fresh .bin")
    // materialize folds the deletes; the next export re-adds WITHOUT
    // descriptors (clearing) and readers see the same rows
    tD.materializeDeletes()
    assert(tD.exportToDelta() == 3L)
    assert(DeltaInterop.snapshot(spark, rootD).files
      .forall(_.dv.isEmpty), "materialize must clear exported DVs")
    assert(DeltaInterop.readDelta(spark, rootD).count() == 8)
    // and the full adopt-back circle serves the masked set
    val reD = DeltaLite.convertFromDelta(spark, rootD,
      tmp("dl-export-dv-re"))
    assert(reD.read().count() == 8)

    val rootC = tmp("dl-export-cm")
    val tC = new DeltaLite(spark, rootC)
    tC.append((1L to 5L).map(k => (k, s"a$k")).toDF("k", "v"))
    tC.renameColumn("v", "w")
    val eC = intercept[IllegalArgumentException](tC.exportToDelta())
    assert(eC.getMessage.contains("column mapping"), eC.getMessage)
  }
}
