package graft

import graft.etl.DeltaLite
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Table properties (TBLPROPERTIES) + change-data-feed sidecars for
  * row-changing rewrites: with `enableChangeDataFeed=true`, merge /
  * updateWhere / upsert write pre/post-image sidecars the CDF serves,
  * row-preserving maintenance (compact/zorder/materializeDeletes) is
  * skipped silently, and un-gated legacy rewrites keep the loud guard.
  */
class CdcRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def seed(root: String): DeltaLite = {
    val t = DeltaLite(spark, root, "k")
    t.append(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "v", "amt"))
    t
  }

  private def changes(t: DeltaLite, from: Int, to: Int) =
    t.changesBetween(from, to).collect()
      .map(r => (r.getAs[String]("_change_type"), r.getAs[Long]("k"),
        r.getAs[String]("v"))).toSet

  test("properties: set/unset, survive overwrite and checkpoint splice") {
    val t = seed(tmp("graft-props"))
    assert(t.tableProperties.isEmpty)
    t.setTableProperties(Map("owner" -> "etl", "enableChangeDataFeed" -> "true"))
    assert(t.tableProperties == Map("owner" -> "etl",
      "enableChangeDataFeed" -> "true"))
    t.unsetTableProperties(Seq("owner", "absent_is_fine"))
    assert(t.tableProperties == Map("enableChangeDataFeed" -> "true"))
    // survive overwrite (logical contract, like CHECK constraints)
    t.overwrite(Seq((9L, "z", 1.0)).toDF("k", "v", "amt"))
    assert(t.tableProperties == Map("enableChangeDataFeed" -> "true"))
    // survive a checkpoint splice + log trim
    t.checkpointNow()
    t.cleanLog()
    val reopened = DeltaLite(spark, t.root)
    assert(reopened.tableProperties == Map("enableChangeDataFeed" -> "true"))
  }

  test("restore reverts table properties with the snapshot (Delta's RESTORE)") {
    val t = seed(tmp("graft-props-restore"))
    val vBare = t.latestVersion.get
    t.setTableProperties(Map("enableChangeDataFeed" -> "true"))
    assert(t.tableProperties.nonEmpty)
    t.restore(vBare)
    assert(t.tableProperties.isEmpty,
      "pre-property snapshot must restore without the property")
  }

  test("merge with CDF: update pre/post, delete, insert all in the feed") {
    val t = seed(tmp("graft-cdc-merge"))
    t.setTableProperties(Map("enableChangeDataFeed" -> "true"))
    val v0 = t.latestVersion.get
    t.merge(
      Seq((1L, "A", 11.0), (3L, "DEL", 0.0), (7L, "new", 70.0))
        .toDF("k", "v", "amt"), "k",
      deleteWhen = Some(col("s.v") === "DEL"),
      insertWhen = Some(col("s.v") =!= "DEL"))
    val got = changes(t, v0, t.latestVersion.get)
    assert(got == Set(
      ("update_preimage", 1L, "a"), ("update_postimage", 1L, "A"),
      ("delete", 3L, "c"),
      ("insert", 7L, "new")), s"got $got")
    // the table itself reads correctly too
    assert(t.read().orderBy("k").collect().map(_.getString(1)).toSeq
      == Seq("A", "b", "new"))
  }

  test("NOT MATCHED BY SOURCE clauses land in the feed") {
    val t = seed(tmp("graft-cdc-bysource"))
    t.setTableProperties(Map("enableChangeDataFeed" -> "true"))
    val v0 = t.latestVersion.get
    t.mergeOn(Seq((1L, "A", 11.0)).toDF("k", "v", "amt"), Seq("k"),
      insertWhen = Some(lit(false)),
      bySourceDeleteWhen = Some(col("t.k") === 2L),
      bySourceUpdateWhen = Some(col("t.k") === 3L),
      bySourceUpdateSet = Some(Seq("v" -> lit("stale"))))
    val got = changes(t, v0, t.latestVersion.get)
    assert(got == Set(
      ("update_preimage", 1L, "a"), ("update_postimage", 1L, "A"),
      ("delete", 2L, "b"),
      ("update_preimage", 3L, "c"), ("update_postimage", 3L, "stale")),
      s"got $got")
  }

  test("updateWhere with CDF emits pre/post images of matched rows only") {
    val t = seed(tmp("graft-cdc-update"))
    t.setTableProperties(Map("enableChangeDataFeed" -> "true"))
    val v0 = t.latestVersion.get
    t.updateWhere(col("k") >= 2L, Seq("v" -> upper(col("v"))))
    val got = changes(t, v0, t.latestVersion.get)
    assert(got == Set(
      ("update_preimage", 2L, "b"), ("update_postimage", 2L, "B"),
      ("update_preimage", 3L, "c"), ("update_postimage", 3L, "C")),
      s"got $got")
  }

  test("upsert with CDF: replaced keys pre/post, fresh keys insert") {
    val t = seed(tmp("graft-cdc-upsert"))
    t.setTableProperties(Map("enableChangeDataFeed" -> "true"))
    val v0 = t.latestVersion.get
    t.upsert(Seq((2L, "B2", 21.0), (8L, "h", 80.0)).toDF("k", "v", "amt"), "k")
    val got = changes(t, v0, t.latestVersion.get)
    assert(got == Set(
      ("update_preimage", 2L, "b"), ("update_postimage", 2L, "B2"),
      ("insert", 8L, "h")), s"got $got")
  }

  test("row-preserving maintenance is skipped silently, not guarded") {
    val t = seed(tmp("graft-cdc-compact"))
    t.setTableProperties(Map("enableChangeDataFeed" -> "true"))
    t.append(Seq((4L, "d", 40.0)).toDF("k", "v", "amt"))
    val v0 = t.latestVersion.get
    assert(t.compact(targetBytes = 1L << 30, minFiles = 2).isDefined)
    // CDF across the compaction: no rows, no error
    assert(t.changesBetween(v0, t.latestVersion.get).count() == 0)
  }

  test("un-gated rewrites keep the loud guard; skipRewrites still works") {
    val t = seed(tmp("graft-cdc-off"))
    val v0 = t.latestVersion.get
    t.upsert(Seq((1L, "A", 11.0)).toDF("k", "v", "amt"), "k")
    val ex = intercept[RuntimeException](
      t.changesBetween(v0, t.latestVersion.get).collect())
    assert(ex.getMessage.contains("skipRewrites"))
    assert(t.changesBetween(v0, t.latestVersion.get, skipRewrites = true)
      .count() == 0)
  }

  test("SQL surface: SET TBLPROPERTIES enables the feed end-to-end") {
    graft.catalog.GraftCatalog.install(spark,
      Files.createTempDirectory("graft-cdc-wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cdc")
    spark.sql("CREATE TABLE graft.cdc.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.cdc.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE graft.cdc.t " +
      "SET TBLPROPERTIES ('enableChangeDataFeed' = 'true')")
    val props = spark.sql("SHOW TBLPROPERTIES graft.cdc.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("enableChangeDataFeed").contains("true"))
    val loc = props("graft.location")
    val t = DeltaLite(spark, loc)
    val v0 = t.latestVersion.get
    spark.sql("UPDATE graft.cdc.t SET v = 'A' WHERE k = 1")
    val got = changes(t, v0, t.latestVersion.get)
    assert(got == Set(("update_preimage", 1L, "a"),
      ("update_postimage", 1L, "A")))
    spark.sql("ALTER TABLE graft.cdc.t UNSET TBLPROPERTIES ('enableChangeDataFeed')")
    assert(t.tableProperties.isEmpty)
  }

  test("user TBLPROPERTIES cannot shadow reserved catalog-derived keys") {
    graft.catalog.GraftCatalog.install(spark,
      Files.createTempDirectory("graft-props-wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.props")
    spark.sql("CREATE TABLE graft.props.t (k BIGINT)")
    spark.sql("INSERT INTO graft.props.t VALUES (1)")
    // ('provider'/'location' are rejected upstream by Spark's parser;
    // 'version' and 'graft.location' reach the catalog and must not
    // shadow the derived values)
    spark.sql("ALTER TABLE graft.props.t SET TBLPROPERTIES (" +
      "'version' = '999', " +
      "'graft.location' = '/nowhere', 'mine' = 'kept')")
    val props = spark.sql("SHOW TBLPROPERTIES graft.props.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("mine").contains("kept"))
    assert(props.get("graft.location").exists(_ != "/nowhere"),
      "user property shadowed the reserved location key")
    assert(props.get("version").exists(_ != "999"),
      "user property shadowed the reserved version key")
  }

  test("vacuum reclaims CDC sidecars of versions below the cutoff") {
    val t = seed(tmp("graft-cdc-vacuum"))
    t.setTableProperties(Map("enableChangeDataFeed" -> "true"))
    val v0 = t.latestVersion.get
    t.updateWhere(col("k") === 1L, Seq("v" -> lit("x")))
    val vUpd = t.latestVersion.get
    assert(t.changesBetween(v0, vUpd).count() == 2)
    t.append(Seq((5L, "e", 50.0)).toDF("k", "v", "amt"))
    t.append(Seq((6L, "f", 60.0)).toDF("k", "v", "amt"))
    val reclaimed = t.vacuum(retainVersions = 1)
    assert(reclaimed.exists(_.contains("_cdc/")),
      s"expected CDC sidecars among $reclaimed")
    // the trimmed CDF range now fails loudly on the missing sidecar
    intercept[Exception](t.changesBetween(v0, vUpd).collect())
  }

  test("reader options: versionAsOf and batch readChangeFeed on named tables") {
    graft.catalog.GraftCatalog.install(spark,
      Files.createTempDirectory("graft-ropt-wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ropt")
    spark.sql("CREATE TABLE graft.ropt.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.ropt.t VALUES (1, 'a')")
    spark.sql("INSERT INTO graft.ropt.t VALUES (2, 'b')")
    // versionAsOf through the DataFrame reader (Delta's option name)
    assert(spark.read.option("versionAsOf", "1").table("graft.ropt.t")
      .count() == 1)
    assert(spark.read.table("graft.ropt.t").count() == 2)
    // batch CDF read with startingVersion/endingVersion
    spark.sql("DELETE FROM graft.ropt.t WHERE k = 1")
    val feed = spark.read.option("readChangeFeed", "true")
      .option("startingVersion", "1").table("graft.ropt.t")
      .select(col("k"), col("_change_type"), col("_commit_version"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(feed == Set((1L, "insert", 1), (2L, "insert", 2),
      (1L, "delete", 3)), s"got $feed")
    val capped = spark.read.option("readChangeFeed", "true")
      .option("startingVersion", "2").option("endingVersion", "2")
      .table("graft.ropt.t")
      .select(col("k"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(capped == Set((2L, "insert")), s"got $capped")
  }

  test("cleanLog reclaims CDC sidecars of trimmed records, keeps survivors") {
    val t = seed(tmp("graft-cdc-clean"))
    t.setTableProperties(Map("enableChangeDataFeed" -> "true"))
    t.updateWhere(col("k") === 1L, Seq("v" -> lit("x"))) // cdc, trimmed
    t.updateWhere(col("k") === 2L, Seq("v" -> lit("y"))) // cdc, at cp
    def cdcParts: Seq[String] = {
      val dir = new org.apache.hadoop.fs.Path(t.root, "_cdc")
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(dir)) Nil
      else {
        val it = fs.listFiles(dir, true)
        val b = Seq.newBuilder[String]
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile && st.getPath.getName.endsWith(".parquet"))
            b += st.getPath.toString
        }
        b.result()
      }
    }
    val before = cdcParts
    assert(before.size >= 2, s"expected two CDC sidecars, got $before")
    t.checkpointNow()
    val removed = t.cleanLog()
    assert(removed.exists(_.contains("_cdc/")),
      s"cleanLog must reclaim the trimmed commit's CDC sidecar: $removed")
    val after = cdcParts
    assert(after.size < before.size, "trimmed CDC sidecar still on disk")
    assert(after.nonEmpty,
      "the checkpoint-version record's CDC sidecar must survive this trim")
    // the NEXT cycle trims the shadowed checkpoint-version record and
    // reclaims its sidecar too — no unbounded leak
    t.append(Seq((8L, "h", 80.0)).toDF("k", "v", "amt"))
    t.checkpointNow()
    val removed2 = t.cleanLog()
    assert(removed2.exists(_.contains("_cdc/")),
      s"second cycle must reclaim the shadowed record's sidecar: $removed2")
    assert(cdcParts.isEmpty, "all CDC below the new checkpoint reclaimed")
    // current-state reads unaffected throughout
    assert(t.read().count() == 4)
  }
}
