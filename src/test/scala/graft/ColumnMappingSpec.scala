package graft

import graft.etl.DeltaLite
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Column mapping: RENAME COLUMN as a metadata-only commit (stable
  * physical ids, Delta's column-mapping=name mode). The hard cases:
  * zero data movement, time travel across the rename, merges and
  * deletes on the renamed column, re-adding the vacated name, CDF and
  * streaming across renames, restore/clone carrying the mapping.
  */
class ColumnMappingSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def mkTable(root: String): DeltaLite = {
    import spark.implicits._
    val t = DeltaLite(spark, root, "k")
    t.append((1L to 50L).map(k => (k, s"row$k")).toDF("k", "v"))
    t.append((51L to 100L).map(k => (k, s"row$k")).toDF("k", "v"))
    t
  }

  test("rename is metadata-only: no files move, data reads under the new name") {
    val t = mkTable(tmp("graft-cm"))
    val filesBefore = t.liveFiles().toSet
    val v = t.renameColumn("v", "value")
    assert(t.commitInfo(v)._1 == "rename")
    assert(t.liveFiles().toSet == filesBefore, "rename must not touch data files")
    assert(t.schema.get.fieldNames.toSeq == Seq("k", "value"))
    val got = t.read().filter(col("k") === 7L).select("value").head().getString(0)
    assert(got == "row7")
    assert(t.read().count() == 100)
    // time travel BEFORE the rename shows the old name and same values
    val old = t.readAsOf(v - 1)
    assert(old.schema.fieldNames.toSeq == Seq("k", "v"))
    assert(old.filter(col("k") === 7L).select("v").head().getString(0) == "row7")
  }

  test("appends and merges after a rename round-trip through the stable id") {
    import spark.implicits._
    val t = mkTable(tmp("graft-cm-merge"))
    t.renameColumn("v", "value")
    // append with the NEW logical schema
    t.append(Seq((101L, "row101")).toDF("k", "value"))
    // merge updates an OLD row (pre-rename file) and an appended one
    t.merge(Seq((7L, "updated7"), (101L, "updated101"), (102L, "fresh"))
      .toDF("k", "value"), "k")
    val m = t.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(7L) == "updated7" && m(101L) == "updated101" && m(102L) == "fresh")
    assert(m.size == 102)
    // the old batch's schema must still enforce: appending under the
    // OLD name is a schema mismatch now
    intercept[IllegalArgumentException] {
      t.append(Seq((999L, "x")).toDF("k", "v"))
    }
  }

  test("deleteWhere and compact on a renamed column; rename of the stats key disables pruning conservatively") {
    import spark.implicits._
    val t = mkTable(tmp("graft-cm-del"))
    t.renameColumn("k", "id")
    t.deleteWhere(col("id") <= 3L)
    assert(t.read().count() == 97)
    // merge keyed on the renamed stats column still lands correctly
    // (pruning is conservatively off: recorded keyCol is the old name)
    val t2 = DeltaLite(spark, t.root, "id")
    t2.upsert(Seq((10L, "up10")).toDF("id", "v"), "id")
    assert(t2.read().filter(col("id") === 10L).head().getString(1) == "up10")
    assert(t2.read().count() == 97)
    // restats re-keys the skipping index under the new name
    t2.restats("id")
    val statted = t2.liveFileStats().filter(_._2.isDefined)
    assert(statted.nonEmpty, "restats must record stats for the new name")
    t2.compact(minFiles = 2)
    assert(t2.read().count() == 97)
    assert(t2.read().filter(col("id") === 10L).head().getString(1) == "up10")
  }

  test("re-adding a vacated name gets a fresh physical id (no collision with old files)") {
    import spark.implicits._
    val t = mkTable(tmp("graft-cm-readd"))
    t.renameColumn("v", "value")
    // schema evolution re-introduces "v" — old files carry a physical
    // "v" holding VALUE data; the new logical v must not read it
    t.appendEvolve(Seq((200L, "row200", 42)).toDF("k", "value", "v"))
    val r7 = t.read().filter(col("k") === 7L).select("value", "v").head()
    assert(r7.getString(0) == "row7" && r7.isNullAt(1),
      "old rows must read the new column as null, not the old physical bytes")
    val r200 = t.read().filter(col("k") === 200L).select("value", "v").head()
    assert(r200.getString(0) == "row200" && r200.getInt(1) == 42)
  }

  test("rename back to the original name collapses the mapping") {
    import spark.implicits._
    val t = mkTable(tmp("graft-cm-back"))
    t.renameColumn("v", "value")
    t.renameColumn("value", "v")
    assert(t.schema.get.fieldNames.toSeq == Seq("k", "v"))
    assert(t.read().filter(col("k") === 7L).select("v").head().getString(0) == "row7")
    t.append(Seq((101L, "row101")).toDF("k", "v"))
    assert(t.read().count() == 101)
  }

  test("restore and clone carry the mapping with the snapshot") {
    import spark.implicits._
    val t = mkTable(tmp("graft-cm-restore"))
    val vRenamed = t.renameColumn("v", "value")
    t.append(Seq((101L, "row101")).toDF("k", "value"))
    // clone AFTER the rename: adopted files keep source physical names
    val clone = t.shallowCloneTo(tmp("graft-cm-clone"))
    assert(clone.schema.get.fieldNames.toSeq == Seq("k", "value"))
    assert(clone.read().filter(col("k") === 7L).select("value")
      .head().getString(0) == "row7")
    // overwrite resets the mapping...
    t.overwrite(Seq((1L, "fresh")).toDF("k", "value"))
    // ...restore to the renamed snapshot brings it back
    t.restore(vRenamed)
    assert(t.schema.get.fieldNames.toSeq == Seq("k", "value"))
    assert(t.read().count() == 100)
    assert(t.read().filter(col("k") === 7L).select("value")
      .head().getString(0) == "row7")
  }

  test("CDF and incremental reads align renamed columns on the stable id") {
    import spark.implicits._
    val t = mkTable(tmp("graft-cm-cdf"))
    t.renameColumn("v", "value")
    t.append(Seq((101L, "row101")).toDF("k", "value"))
    t.deleteWhere(col("k") === 1L)
    // the whole range — spanning the rename — under the END names
    val cdf = t.changesBetween(-1, t.latestVersion.get)
    assert(cdf.schema.fieldNames.toSet ==
      Set("k", "value", "_change_type", "_commit_version"))
    val inserts = cdf.filter(col("_change_type") === "insert")
    assert(inserts.count() == 101)
    assert(inserts.filter(col("k") === 7L).select("value")
      .head().getString(0) == "row7", "pre-rename insert must surface under the new name")
    val deletes = cdf.filter(col("_change_type") === "delete")
    assert(deletes.select("value").head().getString(0) == "row1")
    // append-feed too
    val feed = t.readAppendsSince(-1)
    assert(feed.schema.fieldNames.contains("value") &&
      !feed.schema.fieldNames.contains("v"))
    assert(feed.count() == 101)
  }

  test("streaming source reads physically-named files; rename mid-stream is guarded") {
    import spark.implicits._
    val t = mkTable(tmp("graft-cm-stream"))
    t.renameColumn("v", "value")
    t.append(Seq((101L, "row101")).toDF("k", "value"))
    // a batch spanning pre- and post-rename appends decodes correctly
    // under the captured (current) names
    val out = tmp("graft-cm-stream-out")
    val q = spark.readStream
      .format(classOf[graft.streaming.DeltaSourceProvider].getName)
      .option("path", t.root)
      .load()
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmp("graft-cm-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.read.parquet(out)
    assert(got.schema.fieldNames.toSeq == Seq("k", "value"))
    assert(got.count() == 101)
    assert(got.filter(col("k") === 7L).select("value").head().getString(0) == "row7")
    // a rename AFTER a source captured its schema: the next batch
    // fails (stale declared names — restart to re-capture)
    val src = new graft.streaming.DeltaLiteSource(spark, t.root,
      ignoreChanges = false)
    val v0 = t.latestVersion.get.toLong
    t.renameColumn("value", "txt")
    t.append(Seq((102L, "row102")).toDF("k", "txt"))
    val ex = intercept[RuntimeException] {
      src.getBatch(Some(graft.streaming.VersionOffset(v0)),
        graft.streaming.VersionOffset(t.latestVersion.get.toLong))
    }
    assert(ex.getMessage.contains("renamed"))
    // a FRESH source over the renamed table picks up the new names
    val src2 = new graft.streaming.DeltaLiteSource(spark, t.root,
      ignoreChanges = false)
    assert(src2.schema.fieldNames.toSeq == Seq("k", "txt"))
  }

  test("drop is metadata-only: no files move, column disappears, time travel keeps it") {
    import spark.implicits._
    val t = DeltaLite(spark, tmp("graft-cm-drop"), "k")
    t.append((1L to 50L).map(k => (k, s"row$k", k * 2)).toDF("k", "v", "extra"))
    val filesBefore = t.liveFiles().toSet
    val v = t.dropColumn("extra")
    assert(t.commitInfo(v)._1 == "drop")
    assert(t.liveFiles().toSet == filesBefore, "drop must not touch data files")
    assert(t.schema.get.fieldNames.toSeq == Seq("k", "v"))
    assert(t.read().columns.toSeq == Seq("k", "v"))
    assert(t.read().count() == 50)
    // time travel BEFORE the drop still shows (and reads) the column
    val old = t.readAsOf(v - 1)
    assert(old.schema.fieldNames.toSeq == Seq("k", "v", "extra"))
    assert(old.filter(col("k") === 7L).select("extra").head().getLong(0) == 14L)
    // restore to the pre-drop version resurrects it
    t.restore(v - 1)
    assert(t.schema.get.fieldNames.toSeq == Seq("k", "v", "extra"))
    assert(t.read().filter(col("k") === 7L).select("extra").head().getLong(0) == 14L)
  }

  test("re-adding a dropped name gets a fresh physical id — old bytes never resurface") {
    import spark.implicits._
    val t = DeltaLite(spark, tmp("graft-cm-drop-readd"), "k")
    t.append((1L to 20L).map(k => (k, s"row$k", s"secret$k")).toDF("k", "v", "c"))
    t.dropColumn("c")
    // evolve re-introduces logical "c" — old files still carry a
    // physical "c" with the dropped data; the new c must NOT read it
    t.appendEvolve(Seq((100L, "row100", "fresh100")).toDF("k", "v", "c"))
    val r7 = t.read().filter(col("k") === 7L).select("v", "c").head()
    assert(r7.getString(0) == "row7" && r7.isNullAt(1),
      "dropped column's bytes must not resurface under the re-added name")
    val r100 = t.read().filter(col("k") === 100L).select("v", "c").head()
    assert(r100.getString(0) == "row100" && r100.getString(1) == "fresh100")
    // appends under the current 3-column schema keep working
    t.append(Seq((101L, "row101", "c101")).toDF("k", "v", "c"))
    assert(t.read().count() == 22)
  }

  test("drop of a renamed column tombstones its STABLE physical id") {
    import spark.implicits._
    val t = DeltaLite(spark, tmp("graft-cm-drop-renamed"), "k")
    t.append((1L to 10L).map(k => (k, s"row$k")).toDF("k", "v"))
    t.renameColumn("v", "value")   // physical stays "v"
    t.dropColumn("value")
    assert(t.schema.get.fieldNames.toSeq == Seq("k"))
    // re-adding either name must not read the dropped bytes
    t.appendEvolve(Seq((100L, "newv")).toDF("k", "v"))
    val r1 = t.read().filter(col("k") === 1L).select("v").head()
    assert(r1.isNullAt(0), "stable physical id 'v' was dropped — bytes must stay dead")
    assert(t.read().filter(col("k") === 100L).select("v").head().getString(0) == "newv")
  }

  test("drop is blocked while a CHECK constraint references the column") {
    import spark.implicits._
    val t = DeltaLite(spark, tmp("graft-cm-drop-check"), "k")
    t.append((1L to 10L).map(k => (k, k * 10)).toDF("k", "amt"))
    t.addCheckConstraint("amt_pos", "amt > 0")
    val e = intercept[IllegalArgumentException](t.dropColumn("amt"))
    assert(e.getMessage.contains("amt_pos"))
    t.dropCheckConstraint("amt_pos")
    t.dropColumn("amt")
    assert(t.schema.get.fieldNames.toSeq == Seq("k"))
    // the sole remaining column cannot be dropped
    intercept[IllegalArgumentException](t.dropColumn("k"))
  }

  test("drop mid-stream is guarded like rename; CDF across a drop serves each epoch's schema") {
    import spark.implicits._
    val t = DeltaLite(spark, tmp("graft-cm-drop-stream"), "k")
    t.append((1L to 10L).map(k => (k, s"row$k", k * 1.5)).toDF("k", "v", "score"))
    val src = new graft.streaming.DeltaLiteSource(spark, t.root,
      ignoreChanges = false)
    val v0 = t.latestVersion.get.toLong
    t.dropColumn("score")
    t.append(Seq((11L, "row11")).toDF("k", "v"))
    val ex = intercept[RuntimeException] {
      src.getBatch(Some(graft.streaming.VersionOffset(v0)),
        graft.streaming.VersionOffset(t.latestVersion.get.toLong))
    }
    assert(ex.getMessage.contains("dropped"))
    // incremental feed across the drop: pre-drop rows carry the column,
    // post-drop rows read it as null; no tombstone key ever surfaces
    val feed = t.readAppendsSince(-1)
    assert(feed.columns.forall(!_.startsWith("__graft_dropped__")))
    assert(feed.count() == 11)
    val pre = feed.filter(col("k") === 1L).select("score").head()
    assert(pre.getDouble(0) == 1.5)
    val post = feed.filter(col("k") === 11L).select("score").head()
    assert(post.isNullAt(0))
  }
}
