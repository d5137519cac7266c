package graft

import graft.etl._
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** End-to-end coverage of the reference ETL surface: multiline JSON →
  * flatten → tag → cast → versioned dedup-append table, plus time
  * travel and schema enforcement.
  */
class EtlSpec extends SparkSpec {

  // A payload with the reference's API-response shape (nested structs +
  // an items array), authored here — not fetched.
  private val payload =
    """{
      |  "etag": "abc123",
      |  "nextPageToken": "CAUQAA",
      |  "items": [
      |    {"id": {"videoId": "v1"},
      |     "snippet": {"title": "t1", "description": "d1",
      |                 "channelTitle": "c1",
      |                 "publishedAt": "2024-01-01T10:00:00Z"}},
      |    {"id": {"videoId": "v2"},
      |     "snippet": {"title": "t2", "description": "d2",
      |                 "channelTitle": "c2",
      |                 "publishedAt": "2024-01-02T11:30:00Z"}}
      |  ]
      |}""".stripMargin

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("multiline JSON read + recursive flatten + tag + timestamp cast") {
    val dir = tmp("graft-json")
    Files.writeString(java.nio.file.Paths.get(dir, "r.json"), payload)
    val raw = JsonIngest.readMultiline(spark, s"$dir/r.json")
    val flat = JsonIngest.castTimestamps(
      JsonIngest.flatten(JsonIngest.tag(raw, "keyword", "Iceland")),
      "items_snippet_publishedAt")
    val rows = flat.orderBy("items_id_videoId").collect()
    assert(rows.length == 2)
    val cols = flat.columns.toSet
    assert(Set("keyword", "etag", "nextPageToken", "items_id_videoId",
      "items_snippet_title", "items_snippet_publishedAt").subsetOf(cols))
    assert(rows(0).getAs[String]("items_id_videoId") == "v1")
    assert(rows(0).getAs[String]("keyword") == "Iceland")
    assert(flat.schema("items_snippet_publishedAt").dataType.typeName == "timestamp")
  }

  test("DeltaLite: append, dedup-append, time travel, overwrite") {
    import spark.implicits._
    val t = DeltaLite(spark, tmp("graft-table"))
    val b1 = Seq(("v1", "t1"), ("v2", "t2")).toDF("videoId", "title")
    val b2 = Seq(("v2", "t2x"), ("v3", "t3")).toDF("videoId", "title")

    assert(t.append(b1) == 0)
    assert(t.dedupAppend(b2, "videoId") == 1)
    // v2 was a duplicate — only v3 appended
    assert(t.read().count() == 3)
    assert(t.read().filter($"videoId" === "v2").count() == 1)
    // time travel to v0
    assert(t.readAsOf(0).count() == 2)
    // overwrite resets
    t.overwrite(Seq(("v9", "t9")).toDF("videoId", "title"))
    assert(t.read().count() == 1)
    assert(t.readAsOf(1).count() == 3)
  }

  test("DeltaLite: upsert replaces matched keys, appends new, keeps history") {
    import spark.implicits._
    val t = DeltaLite(spark, tmp("graft-upsert"))
    t.append(Seq(("v1", "old1"), ("v2", "old2")).toDF("videoId", "title"))
    t.upsert(Seq(("v2", "new2"), ("v3", "new3")).toDF("videoId", "title"), "videoId")
    val now = t.read().collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(now == Map("v1" -> "old1", "v2" -> "new2", "v3" -> "new3"))
    // pre-upsert state still readable
    val before = t.readAsOf(0).collect().map(_.getString(1)).toSet
    assert(before == Set("old1", "old2"))
  }

  test("DeltaLite: file-granular upsert rewrites only files containing matched keys") {
    import spark.implicits._
    val t = DeltaLite(spark, tmp("graft-cow"), statsKey = "id")
    // two appends with disjoint key ranges -> two live files with
    // disjoint [min,max] stats
    t.append(Seq((1L, "a1"), (2L, "a2"), (3L, "a3")).toDF("id", "v").coalesce(1))
    t.append(Seq((100L, "b1"), (101L, "b2")).toDF("id", "v").coalesce(1))
    val before = t.liveFiles()
    assert(before.size == 2)
    val lowFile = t.commitInfo(0)._2.head
    val highFile = t.commitInfo(1)._2.head

    // 1-row upsert hits only the low-range file
    val v = t.upsert(Seq((2L, "a2x")).toDF("id", "v").coalesce(1), "id")
    val (mode, added, removed) = t.commitInfo(v)
    assert(mode == "rewrite")
    assert(removed == Seq(lowFile), s"should remove only the low file, got $removed")
    val after = t.liveFiles()
    assert(after.contains(highFile), "untouched file must survive as-is")
    assert(!after.contains(lowFile) && added.forall(after.contains))
    val now = t.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(now == Map(1L -> "a1", 2L -> "a2x", 3L -> "a3",
      100L -> "b1", 101L -> "b2"))

    // upsert entirely outside every file range: pure append, zero rewrites
    val v2 = t.upsert(Seq((500L, "c1")).toDF("id", "v").coalesce(1), "id")
    val (_, _, removed2) = t.commitInfo(v2)
    assert(removed2.isEmpty, "out-of-range upsert must not rewrite any file")
    assert(t.read().count() == 6)
    // history is intact
    assert(t.readAsOf(1).count() == 5)
    assert(t.readAsOf(1).filter($"id" === 2L).select("v").head().getString(0) == "a2")
  }

  test("DeltaLite: history and detail expose the commit-log audit surface") {
    import spark.implicits._
    val t = DeltaLite(spark, tmp("graft-hist"), statsKey = "id")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    t.append(Seq((3L, "c")).toDF("id", "v").coalesce(1))
    t.deleteWhere(col("id") === 2L)
    t.upsert(Seq((1L, "a2")).toDF("id", "v").coalesce(1), "id")
    val h = t.history().collect()
      .map(r => (r.getInt(0), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(h.map(_._1).toSeq == Seq(3, 2, 1, 0), "newest first")
    assert(h.map(_._2).toSeq == Seq("rewrite", "delete", "append", "append"))
    val rw = h.head
    assert(rw._3 >= 1 && rw._4 == 1, s"rewrite deltas: $rw")
    // timestamps are monotone non-decreasing newest-first reversed
    val times = t.history().collect().map(_.getTimestamp(1).getTime).reverse
    assert(times.zip(times.tail).forall { case (a, b) => a <= b })
    val d = t.detail().collect().head
    assert(d.getInt(1) == 3)
    assert(d.getLong(2) == t.liveFiles().size.toLong)
    assert(d.getLong(3) > 0, "live bytes must be positive")
    assert(d.getLong(4) >= 1, "the delete's DV sidecar files must show as live")
    assert(d.getString(5).contains("id"))
  }

  test("DeltaLite: restats re-keys the skipping index without touching data") {
    import spark.implicits._
    val root = tmp("graft-restats")
    val t = DeltaLite(spark, root, statsKey = "id")
    t.append(Seq((1L, "a1"), (2L, "b1")).toDF("id", "name").coalesce(1))
    t.append(Seq((100L, "x1"), (101L, "y1")).toDF("id", "name").coalesce(1))
    // stats are on id → an upsert keyed on name cannot prune
    val before = t.liveFiles().toSet
    val v = t.restats("name").get
    assert(t.commitInfo(v)._1 == "restats")
    assert(t.liveFiles().toSet == before, "restats must not move data files")
    assert(t.read().count() == 4, "rows untouched")
    // reopened with the new stats key, upserts prune on name
    val t2 = DeltaLite(spark, root, statsKey = "name")
    val stats = t2.liveFileStats()
    assert(stats.forall(s => s._2.nonEmpty && s._3.nonEmpty),
      s"every live file must carry name stats: $stats")
    val v2 = t2.upsert(Seq((22L, "b1")).toDF("id", "name").coalesce(1), "name")
    val (_, _, removed) = t2.commitInfo(v2)
    assert(removed.size == 1, s"name-keyed upsert must prune to 1 file: $removed")
    assert(t2.read().collect().map(r => r.getString(1) -> r.getLong(0)).toMap ==
      Map("a1" -> 1L, "b1" -> 22L, "x1" -> 100L, "y1" -> 101L))
    // a restats commit is invisible to history-consuming readers
    assert(t2.readAsOf(v).count() == 4)
  }

  test("DeltaLite: merge applies delete/update/insert clauses with conditions") {
    import spark.implicits._
    val t = DeltaLite(spark, tmp("graft-merge"), statsKey = "id")
    t.append(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
      (4L, "d", 40L)).toDF("id", "v", "ts"))
    // source: 1 → tombstone, 2 → newer update, 3 → STALE update (older
    // ts, must be ignored by the late-arrival guard), 5 → insert,
    // 6 → insert filtered out by the insert condition
    val src = Seq((1L, "DEL", 99L), (2L, "b2", 25L), (3L, "c2", 5L),
      (5L, "e", 50L), (6L, "DEL", 60L)).toDF("id", "v", "ts")
    t.merge(src, "id",
      deleteWhen = Some(col("s.v") === "DEL"),
      updateWhen = Some(col("s.ts") > col("t.ts")),
      insertWhen = Some(col("s.v") =!= "DEL"))
    val now = t.read().collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(now == Map(2L -> ("b2", 25L), 3L -> ("c", 30L),
      4L -> ("d", 40L), 5L -> ("e", 50L)), s"got $now")
    // prior version intact
    assert(t.readAsOf(0).count() == 4)
    // duplicate source keys are rejected
    intercept[IllegalArgumentException] {
      t.merge(Seq((7L, "x", 1L), (7L, "y", 2L)).toDF("id", "v", "ts"), "id")
    }
  }

  test("DeltaLite: merge is file-granular and defaults to plain upsert") {
    import spark.implicits._
    val t = DeltaLite(spark, tmp("graft-merge-cow"), statsKey = "id")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    t.append(Seq((100L, "x"), (101L, "y")).toDF("id", "v").coalesce(1))
    val lowFile = t.commitInfo(0)._2.head
    val highFile = t.commitInfo(1)._2.head
    // no clauses → upsert semantics (always update matched, insert new)
    val ver = t.merge(Seq((2L, "b2"), (50L, "m")).toDF("id", "v"), "id")
    val (mode, _, removed) = t.commitInfo(ver)
    assert(mode == "rewrite")
    assert(removed == Seq(lowFile),
      s"merge must rewrite only the overlapping file, got $removed")
    assert(t.liveFiles().contains(highFile))
    val now = t.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(now == Map(1L -> "a", 2L -> "b2", 50L -> "m",
      100L -> "x", 101L -> "y"))
  }

  test("DeltaLite: change feed returns exactly the appended rows per version") {
    import spark.implicits._
    val t = DeltaLite(spark, tmp("graft-cdc"), statsKey = "id")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))            // v0
    t.append(Seq((3L, "c")).toDF("id", "v"))                       // v1
    t.upsert(Seq((2L, "b2")).toDF("id", "v"), "id")                // v2 rewrite
    t.append(Seq((4L, "d")).toDF("id", "v"))                       // v3
    val changes = t.readAppendsSince(0)
      .select($"id", $"v", $"_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    // v1 and v3 appends only; the v2 rewrite is not a change event
    assert(changes == Set((3L, "c", 1), (4L, "d", 3)))
    assert(t.readAppendsSince(3).collect().isEmpty)
  }

  test("DeltaLite: clustered appends give disjoint file ranges that upsert prunes") {
    import spark.implicits._
    val t = DeltaLite(spark, tmp("graft-cluster"), statsKey = "id")
    // one batch, 200 keys, range-clustered into 4 files
    val v = t.appendClustered(
      spark.range(200).select($"id", ($"id" % 7).cast("string").as("v")), 4)
    val files = t.commitInfo(v)._2
    assert(files.size == 4, s"expected 4 clustered files, got ${files.size}")
    // point upsert: only the file covering key 42 rewrites
    val v2 = t.upsert(Seq((42L, "x")).toDF("id", "v"), "id")
    val (_, _, removed) = t.commitInfo(v2)
    assert(removed.size == 1,
      s"clustered upsert should touch exactly one file, rewrote ${removed.size}")
    assert(t.read().filter($"id" === 42L).select("v").head().getString(0) == "x")
    assert(t.read().count() == 200)
  }

  test("DeltaLite: compact bin-packs small files; vacuum reclaims unreferenced ones") {
    import spark.implicits._
    val t = DeltaLite(spark, tmp("graft-compact"), statsKey = "id")
    // four tiny appends -> four small live files
    for (i <- 0 until 4)
      t.append(Seq((i * 10L, s"v$i")).toDF("id", "v").coalesce(1))
    assert(t.liveFiles().size == 4)
    val before = t.read().orderBy("id").collect().toSeq

    val v = t.compact(targetBytes = 1024 * 1024).get
    assert(t.commitInfo(v)._1 == "rewrite")
    assert(t.liveFiles().size < 4, s"expected fewer files, got ${t.liveFiles()}")
    assert(t.read().orderBy("id").collect().toSeq == before)
    // nothing left to pack -> no-op
    assert(t.compact(targetBytes = 1024 * 1024, minFiles = 2).isEmpty ||
      t.liveFiles().size == 1)

    // pre-compaction files still on disk (time travel works) until vacuum
    assert(t.readAsOf(3).count() == 4)
    val deleted = t.vacuum(retainVersions = 1)
    assert(deleted.nonEmpty, "vacuum should delete the four packed-away files")
    // current snapshot unaffected; live files never deleted
    assert(t.read().orderBy("id").collect().toSeq == before)
    assert(t.liveFiles().forall(p => !deleted.contains(p)))
    // time travel to a vacuumed version now fails (files are gone)
    intercept[Exception] { t.readAsOf(0).collect() }
  }

  test("flatten: generated names that collide with existing columns get suffixed") {
    import spark.implicits._
    val df = spark.read.json(Seq("""{"a": {"b": 1}, "a_b": 2}""").toDS())
    val flat = JsonIngest.flatten(df)
    assert(flat.columns.sorted.toSeq == Seq("a_b", "a_b_"))
    val row = flat.select($"a_b", $"a_b_").head()
    assert(row.getLong(0) == 2L && row.getLong(1) == 1L)
  }

  test("DeltaLite: upsert on a different key than the stats column never prunes wrongly") {
    import spark.implicits._
    // writer recorded stats on `a`; a second handle upserts on `b`
    val dir = tmp("graft-keymix")
    val wA = DeltaLite(spark, dir, statsKey = "a")
    wA.append(Seq((1L, 100L, "x"), (2L, 200L, "y")).toDF("a", "b", "v").coalesce(1))
    val wB = new DeltaLite(spark, dir, statsKey = Some("b"))
    // b=200 lives in the only file; a-range [1,2] would NOT overlap a
    // naive compare against b-bounds — the keyCol check must force the
    // rewrite anyway
    val v = wB.upsert(Seq((2L, 200L, "y2")).toDF("a", "b", "v"), "b")
    assert(wB.commitInfo(v)._3.nonEmpty, "file with matching b must be rewritten")
    val rows = wB.read().collect()
      .map(r => r.getAs[Long]("b") -> r.getAs[String]("v")).toMap
    assert(rows == Map(100L -> "x", 200L -> "y2"), s"got $rows")
    // and the upsert did not reorder the committed schema
    assert(wB.read().columns.toSeq == Seq("a", "b", "v"))
    // a follow-up append in the original column order still passes
    wB.append(Seq((3L, 300L, "z")).toDF("a", "b", "v"))
  }

  test("DeltaLite: an orphan data dir from a crashed commit does not wedge the table") {
    import spark.implicits._
    val dir = tmp("graft-orphan")
    val t = DeltaLite(spark, dir)
    t.append(Seq((1L, "a")).toDF("id", "v"))
    // simulate a crash between data write and log publish for v1
    Seq((99L, "dead")).toDF("id", "v").write.parquet(s"$dir/v=1")
    // next commit must clear the orphan and succeed at v1
    val v = t.append(Seq((2L, "b")).toDF("id", "v"))
    assert(v == 1)
    assert(t.read().collect().map(_.getLong(0)).toSet == Set(1L, 2L),
      "orphan rows must not appear")
  }

  test("DeltaLite: change feed decodes each commit with its own schema") {
    import spark.implicits._
    val t = DeltaLite(spark, tmp("graft-cdc-schema"))
    t.append(Seq((1L, "a")).toDF("id", "v"))            // v0: (id, v)
    t.overwrite(Seq((1L, "a", 1.5)).toDF("id", "v", "w")) // v1: schema widens
    t.append(Seq((2L, "b", 2.5)).toDF("id", "v", "w"))  // v2
    val feed = t.readAppendsSince(-1).orderBy("_commit_version")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("v"),
        Option(r.getAs[Any]("w")), r.getAs[Int]("_commit_version")))
    // v0 rows align by name: w is explicitly null, not fabricated
    assert(feed.toSeq == Seq((1L, "a", None, 0), (2L, "b", Some(2.5), 2)))
  }

  test("DeltaLite edge cases: vacuum beyond history, upsert without stats") {
    import spark.implicits._
    // vacuum with retainVersions > history: nothing deleted
    val t = DeltaLite(spark, tmp("graft-edge"), statsKey = "id")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    assert(t.vacuum(retainVersions = 10).isEmpty)
    // upsert on a table WITHOUT statsKey: every file is conservatively
    // a rewrite candidate — still correct, just unpruned
    val u = DeltaLite(spark, tmp("graft-nostats"))
    u.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    u.append(Seq((3L, "c")).toDF("id", "v").coalesce(1))
    val v = u.upsert(Seq((2L, "b2")).toDF("id", "v"), "id")
    assert(u.commitInfo(v)._3.size == 2, "no stats -> all files rewritten")
    assert(u.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "a", 2L -> "b2", 3L -> "c"))
  }

  test("DeltaLite: additive schema evolution widens without rewriting history") {
    import spark.implicits._
    val t = DeltaLite(spark, tmp("graft-evolve"))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    val v1 = t.appendEvolve(Seq((3L, "c", 0.9)).toDF("id", "name", "score"))
    // snapshot carries the widened schema; pre-evolution rows read null
    val snap = t.read().orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(snap.toSeq == Seq((1L, "a", None), (2L, "b", None), (3L, "c", Some(0.9))))
    // the recorded schema must mark the evolved column NULLABLE even
    // though the batch frame's was not (toDF on Double gives
    // nullable=false) — otherwise NullPropagation folds IS NULL on the
    // snapshot to false and the pre-evolution rows silently vanish
    assert(t.schema.get("score").nullable)
    assert(t.read().filter($"score".isNull).count() == 2)
    assert(t.read().filter($"score".isNotNull).count() == 1)
    // time travel to before the evolution keeps the narrow schema
    assert(t.readAsOf(v1 - 1).columns.toSeq == Seq("id", "name"))
    // a batch missing a table column aligns to null, not an error —
    // and that column's recorded nullability widens with it
    t.appendEvolve(Seq((4L, 0.5)).toDF("id", "score"))
    val r4 = t.read().filter($"id" === 4L).collect().head
    assert(r4.isNullAt(1) && r4.getDouble(2) == 0.5)
    assert(t.read().filter($"name".isNull).count() == 1)
    // a batch column differing only in case resolves to the table's
    // column (Spark's default case-insensitive analysis), not a new one
    t.appendEvolve(Seq((5L, "e")).toDF("ID", "Name"))
    assert(t.schema.get.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(t.read().filter($"id" === 5L).select("name").head.getString(0) == "e")
    // type changes stay rejected
    val e = intercept[IllegalArgumentException] {
      t.appendEvolve(Seq((6L, 7)).toDF("id", "score"))
    }
    assert(e.getMessage.contains("additive"))
  }

  test("DeltaLite: restore re-references an old snapshot with zero data I/O") {
    import spark.implicits._
    val t = DeltaLite(spark, tmp("graft-restore"))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))          // v0
    t.append(Seq((3L, "c")).toDF("k", "v"))                     // v1
    t.overwrite(Seq((9L, "bad")).toDF("k", "v"))                // v2: bad load
    val v = t.restore(1)                                        // v3
    assert(v == 3)
    assert(t.read().orderBy("k").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 3L))
    // log-only: the restore commit added no new data files. Mode is
    // `overwrite` (snapshot replacement) so the deletion-vector replay
    // resets with the restored live set — see DeletionVectorSpec.
    val (mode, added, removed) = t.commitInfo(3)
    assert(mode == "overwrite")
    val v1Files = t.commitInfo(0)._2 ++ t.commitInfo(1)._2
    assert(added.toSet == v1Files.toSet, "restore must re-reference old files")
    assert(removed.toSet == t.commitInfo(2)._2.toSet)
    // the undone version is still time-travelable
    assert(t.readAsOf(2).collect().map(_.getLong(0)).toSeq == Seq(9L))
    // restore to a vacuumed version refuses loudly
    t.overwrite(Seq((10L, "z")).toDF("k", "v"))
    t.vacuum(retainVersions = 1)
    assertThrows[IllegalArgumentException](t.restore(2))
  }

  test("DeltaLite: optimizeZOrder tightens 2-D file bounding boxes") {
    import spark.implicits._
    val n = 4096
    val rows = (0 until n).map { i =>
      // row-major order: a linear layout is tight on `a`, loose on `b`
      (i.toLong, (i % 64).toLong, (i / 64).toLong)
    }
    val t = DeltaLite(spark, tmp("graft-zopt"))
    t.append(rows.toDF("id", "a", "b").repartitionByRange(8, col("a")))
    // how many live files could contain rows with b < 8 — the
    // dimension the linear (a-range) layout leaves unbounded
    def bHits(): Int = spark.read.parquet(t.liveFiles(): _*)
      .groupBy(input_file_name().as("f"))
      .agg(min($"b").as("b0"))
      .collect()
      .count(_.getAs[Long]("b0") < 8)
    val before = bHits()
    val pre = t.read().orderBy("id").collect().toSeq
    t.optimizeZOrder("a", "b", numFiles = 8)
    val after = bHits()
    // same rows, new layout
    assert(t.read().orderBy("id").collect().toSeq == pre)
    // linear: every a-slice file spans all of b → all files hit;
    // Z-order: low-b cells concentrate in few z-ranges
    assert(before == 8, s"linear layout should hit all 8 files, got $before")
    assert(after <= before / 2,
      s"b-slab file hits should drop: before=$before after=$after")
    assert(t.readAsOf(0).count() == n)
  }

  test("DeltaLite: readIndexed skips files during scan planning") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThanOrEqual, LessThan, Literal}
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.graftbridge.DeltaLiteFileIndex
    import org.apache.spark.sql.types.{LongType, StringType}
    val dir = tmp("graft-idx")
    val t = DeltaLite(spark, dir, statsKey = "k")
    t.appendClustered((0L until 400L).map(k => (k, s"v$k")).toDF("k", "v"),
      numFiles = 8)

    // planning-level skip: drive the index with pushed-filter shapes
    val idx = new DeltaLiteFileIndex(spark,
      new org.apache.hadoop.fs.Path(dir),
      t.liveFileStats().map { case (p, mn, mx) => (p, None, Map("k" -> (mn, mx))) },
      t.read().schema)
    val k = AttributeReference("k", LongType)()
    def filesFor(preds: Expression*): Int =
      idx.listFiles(Nil, preds).head.files.size
    assert(idx.listFiles(Nil, Nil).head.files.size == 8)
    assert(filesFor(EqualTo(k, Literal(257L))) == 1,
      "point lookup should plan exactly one file")
    val rangeFiles = filesFor(And(GreaterThanOrEqual(k, Literal(100L)),
      LessThan(k, Literal(200L))))
    assert(rangeFiles >= 2 && rangeFiles <= 3, s"range planned $rangeFiles")
    // predicates on a non-stats column must not skip anything
    assert(filesFor(EqualTo(AttributeReference("v", StringType)(),
      Literal("v7"))) == 8)

    // end-to-end: the integrated scan reads ONE file's rows for the
    // point lookup (50 of 400), and results match the plain read
    def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
      df.collect()
      def find(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => find(a.executedPlan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(find)
      }
      find(df.queryExecution.executedPlan).head
    }
    val q = t.readIndexed().filter($"k" === 257L)
    assert(q.collect().map(_.getString(1)).toSeq == Seq("v257"))
    assert(scanOf(q).metrics("numOutputRows").value == 50,
      "the executed scan should read exactly one 50-row file")
    assert(t.readIndexed().orderBy("k").collect().toSeq ==
      t.read().orderBy("k").collect().toSeq)
  }

  test("DeltaLite: TIMESTAMP AS OF reads the version published by then") {
    import spark.implicits._
    val dir = tmp("graft-asof-ts")
    val t = DeltaLite(spark, dir)
    t.append(Seq((1L, "a")).toDF("k", "v")) // v0
    t.append(Seq((2L, "b")).toDF("k", "v")) // v1
    // pin publish times a minute apart (mtime is the publish clock)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val base = 1700000000000L
    fs.setTimes(new org.apache.hadoop.fs.Path(s"$dir/_log/0.json"), base, -1)
    fs.setTimes(new org.apache.hadoop.fs.Path(s"$dir/_log/1.json"),
      base + 60000, -1)
    def at(ms: Long) = t.readAsOfTime(new java.sql.Timestamp(ms)).count()
    assert(at(base) == 1)              // exactly at v0's publish
    assert(at(base + 30000) == 1)      // between the commits
    assert(at(base + 60000) == 2)      // v1 visible from its publish
    assert(at(base + 999999) == 2)
    assertThrows[IllegalArgumentException](at(base - 1))
  }

  test("DeltaLite: appendChecked enforces CHECK constraints atomically") {
    import spark.implicits._
    val t = DeltaLite(spark, tmp("graft-check"))
    val rules = Seq("positive" -> (col("v") > 0.0))
    t.appendChecked(Seq((1L, 2.0), (2L, 3.0)).toDF("k", "v"), rules)
    assert(t.read().count() == 2)
    val before = t.latestVersion
    val e = intercept[IllegalStateException] {
      t.appendChecked(Seq((3L, 4.0), (4L, -1.0)).toDF("k", "v"), rules)
    }
    assert(e.getMessage.contains("positive"))
    // nothing committed: the violating batch is rejected whole
    assert(t.latestVersion == before)
    assert(t.read().count() == 2)
  }

  test("DeltaLite: shallow clone re-references files, then diverges") {
    import spark.implicits._
    val src = DeltaLite(spark, tmp("graft-clone-src"), statsKey = "k")
    src.appendClustered((0L until 100L).map(k => (k, s"v$k")).toDF("k", "v"),
      numFiles = 4)
    val clone = src.shallowCloneTo(tmp("graft-clone-dst") + "/t")
    // metadata-only: the clone's first commit lists the SOURCE's files
    assert(clone.commitInfo(0)._2.toSet == src.liveFiles().toSet)
    assert(clone.read().orderBy("k").collect().toSeq ==
      src.read().orderBy("k").collect().toSeq)
    // divergence: writes to the clone never touch the source
    clone.upsert(Seq((7L, "patched")).toDF("k", "v"), "k")
    assert(clone.read().filter($"k" === 7L).head.getString(1) == "patched")
    assert(src.read().filter($"k" === 7L).head.getString(1) == "v7")
    assert(src.liveFiles().forall(f => new java.io.File(
      new org.apache.hadoop.fs.Path(f).toUri.getPath).exists))
    // stats survive the clone: a point upsert rewrites ~1 source file
    val (_, added, removed) = clone.commitInfo(clone.latestVersion.get)
    assert(removed.size <= 2, s"stats should prune the clone upsert: $removed")
    // cloning into a non-empty table refuses
    assertThrows[IllegalArgumentException](src.shallowCloneTo(clone.root))

    // vacuum on the clone must NEVER reach across and delete the
    // source's files, even though its log references them
    val cloneDeleted = clone.vacuum(retainVersions = 1)
    assert(cloneDeleted.forall(_.contains("graft-clone-dst")),
      s"clone vacuum deleted foreign files: $cloneDeleted")
    assert(src.read().count() == 100, "source corrupted by clone vacuum")
  }

  test("DeltaLite: readIndexed prunes on date-typed stats without losing rows") {
    import spark.implicits._
    // dates push down as Catalyst internal days-since-epoch literals;
    // the index must compare them in the stats' string form, or every
    // file is mispruned and the query silently returns nothing
    val t = DeltaLite(spark, tmp("graft-idx-date"), statsKey = "d")
    val rows = (0 until 120).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), i)
    }
    t.appendClustered(rows.toDF("d", "v"), numFiles = 4)
    val probe = java.sql.Date.valueOf("2024-03-15")
    val q = t.readIndexed().filter($"d" === probe)
    assert(q.collect().map(_.getInt(1)).toSeq == Seq(74))
    // and the skip actually happened: a 30-day slab plans < 4 files
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, AttributeReference, Literal}
    import org.apache.spark.sql.graftbridge.DeltaLiteFileIndex
    val idx = new DeltaLiteFileIndex(spark,
      new org.apache.hadoop.fs.Path(t.liveFiles().head).getParent,
      t.liveFileStats().map { case (p, mn, mx) => (p, None, Map("d" -> (mn, mx))) },
      t.read().schema)
    val kept = idx.listFiles(Nil, Seq(EqualTo(
      AttributeReference("d", org.apache.spark.sql.types.DateType)(),
      Literal.create(probe, org.apache.spark.sql.types.DateType))))
      .head.files.size
    assert(kept == 1, s"date point lookup planned $kept files")
  }

  test("DeltaLite: schema enforcement rejects drifted batch") {
    import spark.implicits._
    val t = DeltaLite(spark, tmp("graft-schema"))
    t.append(Seq(("v1", 1L)).toDF("videoId", "n"))
    val drifted = Seq(("v2", "oops")).toDF("videoId", "n")
    val e = intercept[IllegalArgumentException](t.append(drifted))
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("Pipeline.run: reference job loop is idempotent on the key") {
    val raw = tmp("graft-raw")
    val t = DeltaLite(spark, tmp("graft-pipe"))
    val keyword = Countries.pick(seed = 42L)._2
    val pipe = new Pipeline(spark, () => payload, raw,
      df => JsonIngest.castTimestamps(
        JsonIngest.flatten(JsonIngest.tag(df, "keyword", keyword)),
        "items_snippet_publishedAt"),
      t, dedupKey = "items_id_videoId")
    val (_, v1) = pipe.run("search_1")
    assert(v1 == 0 && t.read().count() == 2)
    val (_, v2) = pipe.run("search_2") // same payload again
    assert(v2 == 1 && t.read().count() == 2) // no duplicates appended
  }

  test("Countries: deterministic pick from ISO data") {
    assert(Countries.all.size > 200)
    assert(Countries.pick(42L) == Countries.pick(42L))
    assert(Countries.all.exists(_._1 == "IS"))
  }

  test("etl queries: json extract and dedup append invariants") {
    val je = queries.Etl.jsonExtract(spark, sf).collect()
    assert(je.nonEmpty && je.forall(_.getAs[Int]("k") >= 50))
    val da = queries.Etl.dedupAppend(spark, sf)
    assert(da.filter(col("doc_id") % 10 === 0).count() == 0)
    assert(da.count() > 0)
  }
}
