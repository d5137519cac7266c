package graft

import graft.etl.DeltaLite
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Merge-on-read DELETE via deletion-vector sidecars: O(matched) write
  * cost, no data-file rewrite, read-path anti-join, materialization,
  * and the interplay with upsert / restore / clone / compact / vacuum.
  */
class DeletionVectorSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def mkTable(root: String): DeltaLite = {
    import spark.implicits._
    val t = DeltaLite(spark, root, "k")
    t.append((1L to 100L).map(k => (k, s"row$k")).toDF("k", "v"))
    t.append((101L to 200L).map(k => (k, s"row$k")).toDF("k", "v"))
    t
  }

  test("deleteWhere hides rows without rewriting any data file") {
    val t = mkTable(tmp("graft-dv"))
    val filesBefore = t.liveFiles().toSet
    val v = t.deleteWhere(col("k") % 10 === 0).get
    val (mode, added, removed) = t.commitInfo(v)
    assert(mode == "delete")
    assert(removed.isEmpty, "merge-on-read must not remove data files")
    assert(t.liveFiles().toSet == filesBefore, "data live-set unchanged")
    assert(added.nonEmpty, "the commit must reference DV sidecars")
    val got = t.read().select("k").collect().map(_.getLong(0)).sorted
    assert(got.length == 180 && got.forall(_ % 10 != 0))
    // time travel BEFORE the delete still sees every row
    assert(t.readAsOf(v - 1).count() == 200)
    // deleting the same rows again matches nothing
    assert(t.deleteWhere(col("k") % 10 === 0).isEmpty)
  }

  test("upsert after delete: deleted rows do not resurrect through the rewrite") {
    import spark.implicits._
    val t = mkTable(tmp("graft-dv-up"))
    t.deleteWhere(col("k") === 5L)
    // upsert a batch whose key range touches the file containing k=5
    t.upsert(Seq((6L, "updated")).toDF("k", "v"), "k")
    val ks = t.read().select("k").collect().map(_.getLong(0)).toSet
    assert(!ks.contains(5L), "k=5 resurrected through the upsert rewrite")
    assert(t.read().filter(col("k") === 6L).head().getString(1) == "updated")
    assert(t.read().count() == 199)
  }

  test("materializeDeletes folds DVs into file-granular rewrites and retires them") {
    val t = mkTable(tmp("graft-dv-mat"))
    t.deleteWhere(col("k") <= 3L) // touches only the first append's range
    val before = t.read().select("k").collect().map(_.getLong(0)).sorted
    val v = t.materializeDeletes().get
    val (_, _, removed) = t.commitInfo(v)
    assert(removed.nonEmpty, "affected files must be rewritten")
    val after = t.read().select("k").collect().map(_.getLong(0)).sorted
    assert(before.sameElements(after), "materialization must not change reads")
    assert(t.read().count() == 197)
    // second file (101..200) untouched: its original path survives
    val live = t.liveFiles().toSet
    assert(t.commitInfo(1)._2.exists(live), "untouched file must not rewrite")
    assert(t.materializeDeletes().isEmpty, "no DVs left to materialize")
  }

  test("restore across a delete resurrects; restore after keeps the DVs") {
    val t = mkTable(tmp("graft-dv-rst")) // v0, v1
    val dv = t.deleteWhere(col("k") === 42L).get // v2
    t.restore(1) // back before the delete
    assert(t.read().filter(col("k") === 42L).count() == 1, "restore must undo the delete")
    t.restore(dv) // forward again to the deleted state (DVs re-referenced)
    assert(t.read().filter(col("k") === 42L).count() == 0, "restore must carry DVs")
    assert(t.read().count() == 199)
  }

  test("shallow clone carries deletion vectors; compact folds them in") {
    import spark.implicits._
    val t = mkTable(tmp("graft-dv-cl"))
    t.deleteWhere(col("k") > 190L)
    val clone = t.shallowCloneTo(tmp("graft-dv-cl-tgt"))
    assert(clone.read().count() == 190, "clone resurrected deleted rows")
    // compact packs the small files, materializing the deletions
    val v = t.compact(targetBytes = 1024 * 1024, minFiles = 2)
    assert(v.isDefined)
    assert(t.read().count() == 190)
    assert(t.read().agg(max(col("k"))).head().getLong(0) == 190L)
  }

  test("change feed emits inserts and the exact deleted rows; rewrites guarded") {
    import spark.implicits._
    val t = mkTable(tmp("graft-dv-cdc")) // v0: 1..100, v1: 101..200
    t.deleteWhere(col("k").isin(7L, 150L)) // v2
    val feed = t.changesBetween(0, 2)
    val inserts = feed.filter(col("_change_type") === "insert")
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(inserts == (101L to 200L),
      "inserts must be exactly v1's appended rows")
    val deletes = feed.filter(col("_change_type") === "delete")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getInt(r.fieldIndex("_commit_version")))).sortBy(_._1).toSeq
    assert(deletes == Seq((7L, "row7", 2), (150L, "row150", 2)),
      s"delete feed must carry the full deleted rows: $deletes")
    // a rewrite commit (upsert) poisons the feed unless skipped
    t.upsert(Seq((8L, "updated")).toDF("k", "v"), "k") // v3
    assertThrows[IllegalArgumentException](t.changesBetween(2, 3))
    assert(t.changesBetween(2, 3, skipRewrites = true).count() == 0)
  }

  test("change-feed read across a mass-delete commit respects the DV broadcast guard") {
    val t = mkTable(tmp("graft-dv-cdc-guard"))
    val v0 = t.latestVersion.get
    t.deleteWhere(col("k") % 2 === 0) // mass delete: 100-row DV
    val vDel = t.latestVersion.get
    try {
      spark.conf.set("spark.graft.dv.broadcastLimit", "1b")
      // the per-commit DV must ride the SAME guard as scan paths:
      // loud failure, not an executor OOM mid-broadcast
      val e = intercept[IllegalStateException](
        t.changesBetween(v0, vDel).count())
      assert(e.getMessage.contains("broadcast guard"), e.getMessage)
    } finally spark.conf.unset("spark.graft.dv.broadcastLimit")
    // within budget the feed serves the full deleted content
    assert(t.changesBetween(v0, vDel)
      .filter(col("_change_type") === "delete").count() == 100)
  }

  test("DVs on an ADOPTED table mask on every read route — file_path rendering differences cannot resurrect rows") {
    // an adopted (convert) table's entry paths are posix "/x" while
    // deleteWhere's scan records `_metadata.file_path` — which the
    // standard datasource route renders fs-QUALIFIED ("file:/x") and
    // the graftbridge FileIndex renders VERBATIM. Without a canonical
    // DV join key the readIndexed anti-join would miss every DV row
    // and silently resurrect the deleted rows on exactly one route.
    import spark.implicits._
    val src = tmp("graft-dv-adopt-src")
    (1L to 50L).map(k => (k, s"r$k")).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(src)
    val dataName = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getName
    val schemaJson = org.apache.spark.sql.types.StructType.fromDDL(
      "k bigint, v string").json.replace("\"", "\\\"")
    val log = new java.io.File(src, "_delta_log")
    log.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(log, f"${0L}%020d.json").toPath,
      (s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""" +
        "\n" +
        s"""{"metaData":{"id":"t","format":{"provider":"parquet"},""" +
        s""""schemaString":"$schemaJson","partitionColumns":[],""" +
        s""""configuration":{}}}""" + "\n" +
        s"""{"add":{"path":"$dataName","partitionValues":{},""" +
        s""""size":${new java.io.File(src, dataName).length()},""" +
        s""""modificationTime":0,"dataChange":true}}""" + "\n")
        .getBytes("UTF-8"))
    val t = DeltaLite.convertFromDelta(spark, src, tmp("graft-dv-adopt"),
      statsKey = Some("k"))
    assert(t.liveFiles().forall(_.startsWith("/")),
      s"fixture must exercise posix entry paths: ${t.liveFiles()}")
    t.deleteWhere(col("k") % 5L === 0L)
    val viaRead = t.read().select("k").collect().map(_.getLong(0)).toSet
    val viaIndexed = t.readIndexed().select("k").collect()
      .map(_.getLong(0)).toSet
    assert(viaRead == viaIndexed,
      s"routes diverged: read=${viaRead.size} indexed=${viaIndexed.size}")
    assert(viaIndexed.size == 40 && viaIndexed.forall(_ % 5 != 0),
      s"deleted rows resurrected through readIndexed: " +
        s"${viaIndexed.filter(_ % 5 == 0)}")
    // the change feed's inner join decodes the same deleted rows
    val deleted = t.changesBetween(0, t.latestVersion.get)
      .filter(col("_change_type") === "delete")
      .select("k").collect().map(_.getLong(0)).toSet
    assert(deleted == (1L to 50L).filter(_ % 5 == 0).toSet,
      s"CDF missed adopted-file deletes: $deleted")
  }

  test("vacuum retains live DV sidecars; readIndexed applies DVs") {
    val t = mkTable(tmp("graft-dv-vac"))
    t.deleteWhere(col("k") === 7L)
    t.append(spark.range(201, 211).toDF("k")
      .withColumn("v", concat(lit("row"), col("k")))
      .select(col("k"), col("v")))
    val gone = t.vacuum(retainVersions = 1)
    assert(t.read().count() == 209, s"vacuum broke the snapshot (removed $gone)")
    assert(t.read().filter(col("k") === 7L).count() == 0,
      "vacuum deleted a live DV sidecar — deleted row resurrected")
    val idx = t.readIndexed()
    assert(idx.count() == 209)
    assert(idx.filter(col("k") === 7L).count() == 0,
      "readIndexed must apply deletion vectors")
  }
}
