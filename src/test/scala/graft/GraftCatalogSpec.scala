package graft

import graft.catalog.GraftCatalog
import graft.etl.DeltaLite
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The analyst-facing catalog surface: named DeltaLite tables from
  * plain SQL — create/insert/select/time-travel/alter/drop plus the
  * CALL maintenance procedures (the reference's
  * `saveAsTable`/`spark.table`/`%sql` workflow on Graft's format).
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  /** numFiles of the (already-executed) df's file scan — the caller
    * must have collected EXACTLY once: re-execution resets the
    * driver-side metric to 0 (selectedPartitions caches, so the
    * second run never re-posts it).
    */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: QueryStageExec => scans(qs.plan)
    }.flatten
    scans(df.queryExecution.executedPlan).head.metrics("numFiles").value
  }

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-warehouse").toString
    GraftCatalog.install(spark, dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.gold")
    // the graft catalog instance is cached per session after first
    // lookup, so if ANOTHER suite touched it first its warehouse wins
    // — resolve the EFFECTIVE warehouse from a probe table's location
    // instead of trusting this install's directory
    spark.sql("CREATE TABLE IF NOT EXISTS graft.gold.whprobe (k BIGINT)")
    val loc = spark.sql("SHOW TBLPROPERTIES graft.gold.whprobe").collect()
      .find(_.getString(0) == "graft.location").get.getString(1)
    new java.io.File(loc).getParentFile.getParentFile.toString
  }

  test("CREATE TABLE + INSERT INTO + SELECT round-trips through SQL only") {
    wh
    spark.sql("CREATE TABLE graft.gold.kv (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.gold.kv VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("INSERT INTO graft.gold.kv VALUES (4, 'd')")
    val got = spark.sql(
      "SELECT k, v FROM graft.gold.kv ORDER BY k").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    // the two inserts are two versioned commits on a schema-only v0
    val t = new DeltaLite(spark, s"$wh/gold/kv")
    assert(t.latestVersion.contains(2))
    // spark.table resolves the same way
    assert(spark.table("graft.gold.kv").count() == 4)
  }

  test("INSERT OVERWRITE replaces in one commit; VERSION AS OF travels back") {
    wh
    spark.sql("CREATE TABLE graft.gold.ow (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.gold.ow VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT OVERWRITE graft.gold.ow VALUES (9, 'z')")
    assert(spark.sql("SELECT * FROM graft.gold.ow").count() == 1)
    val old = spark.sql(
      "SELECT k FROM graft.gold.ow VERSION AS OF 1 ORDER BY k").collect()
    assert(old.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(spark.sql("SELECT * FROM graft.gold.ow VERSION AS OF 0").count() == 0)
  }

  test("catalog reads go through the skipping FileIndex (stats prune)") {
    wh
    val root = s"$wh/gold/indexed"
    val t = new DeltaLite(spark, root, statsKey = Some("k"))
    (0 until 8).foreach(i => t.append(
      Seq((i * 10L, s"f$i")).toDF("k", "v")))
    val df = spark.sql("SELECT v FROM graft.gold.indexed WHERE k = 30")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("f3"))
    // point lookup plans 1 of 8 files through the commit-log index
    assert(scannedFiles(df) == 1, "expected 1-file scan")
  }

  test("partitioned CREATE TABLE lays out hive dirs and prunes") {
    wh
    spark.sql("CREATE TABLE graft.gold.pt (k BIGINT, etype STRING) " +
      "PARTITIONED BY (etype)")
    spark.sql("INSERT INTO graft.gold.pt VALUES " +
      "(1, 'click'), (2, 'view'), (3, 'click')")
    val t = new DeltaLite(spark, s"$wh/gold/pt")
    assert(t.partitionColumns == Seq("etype"))
    assert(t.liveFiles().exists(_.contains("__p_")),
      "insert through the catalog must use the declared hive layout")
    assert(spark.sql(
      "SELECT k FROM graft.gold.pt WHERE etype = 'click'").count() == 2)
  }

  test("ALTER TABLE RENAME/DROP COLUMN are metadata-only commits") {
    wh
    spark.sql("CREATE TABLE graft.gold.alt (k BIGINT, v STRING, extra INT)")
    spark.sql("INSERT INTO graft.gold.alt VALUES (1, 'a', 10)")
    val filesBefore = new DeltaLite(spark, s"$wh/gold/alt").liveFiles().toSet
    spark.sql("ALTER TABLE graft.gold.alt RENAME COLUMN v TO txt")
    spark.sql("ALTER TABLE graft.gold.alt DROP COLUMN extra")
    val t = new DeltaLite(spark, s"$wh/gold/alt")
    assert(t.schema.get.fieldNames.toSeq == Seq("k", "txt"))
    assert(t.liveFiles().toSet == filesBefore, "zero data rewritten")
    assert(spark.sql("SELECT txt FROM graft.gold.alt").collect()
      .head.getString(0) == "a")
  }

  test("DROP TABLE, SHOW TABLES, table rename") {
    wh
    spark.sql("CREATE TABLE graft.gold.tmp1 (k BIGINT)")
    assert(spark.sql("SHOW TABLES IN graft.gold").collect()
      .map(_.getString(1)).contains("tmp1"))
    spark.sql("ALTER TABLE graft.gold.tmp1 RENAME TO gold.tmp2")
    assert(spark.table("graft.gold.tmp2").schema.fieldNames.sameElements(Array("k")))
    spark.sql("DROP TABLE graft.gold.tmp2")
    assert(!spark.sql("SHOW TABLES IN graft.gold").collect()
      .map(_.getString(1)).contains("tmp2"))
    intercept[Exception](spark.table("graft.gold.tmp2").collect())
  }

  test("CTAS: CREATE TABLE AS SELECT lands the query result") {
    wh
    spark.sql("CREATE TABLE graft.gold.ctas AS " +
      "SELECT id AS k, concat('v', id) AS v FROM range(5)")
    assert(spark.sql("SELECT count(*) AS n FROM graft.gold.ctas")
      .head().getLong(0) == 5)
  }

  test("CREATE OR REPLACE TABLE: one atomic commit, history survives") {
    wh
    // fresh create through the staged path
    spark.sql("CREATE OR REPLACE TABLE graft.gold.corr AS " +
      "SELECT id AS k, concat('v', id) AS v FROM range(3)")
    assert(spark.sql("SELECT count(*) AS n FROM graft.gold.corr")
      .head().getLong(0) == 3)
    val loc = spark.sql("SHOW TBLPROPERTIES graft.gold.corr").collect()
      .find(_.getString(0) == "graft.location").get.getString(1)
    val t = graft.etl.DeltaLite(spark, loc)
    val vBefore = t.latestVersion.get
    // replace: new content AND new schema, ONE commit in the same log
    spark.sql("CREATE OR REPLACE TABLE graft.gold.corr AS " +
      "SELECT id AS k, id * 10 AS amt FROM range(2)")
    assert(t.latestVersion.get == vBefore + 1,
      "REPLACE must be exactly one commit — no drop/create window")
    assert(spark.table("graft.gold.corr").schema.fieldNames.toSeq
      == Seq("k", "amt"))
    assert(spark.sql("SELECT sum(amt) AS s FROM graft.gold.corr")
      .head().getLong(0) == 10)
    // the pre-replace snapshot stays time-travelable
    val old = spark.sql(
      s"SELECT v FROM graft.gold.corr VERSION AS OF $vBefore ORDER BY v")
      .collect().map(_.getString(0)).toSeq
    assert(old == Seq("v0", "v1", "v2"),
      "history below the replace must survive")
  }

  test("REPLACE TABLE with a column list publishes the empty schema atomically") {
    wh
    spark.sql("CREATE TABLE graft.gold.rpl (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.gold.rpl VALUES (1, 'a')")
    spark.sql("REPLACE TABLE graft.gold.rpl (k BIGINT, amt DOUBLE)")
    assert(spark.table("graft.gold.rpl").schema.fieldNames.toSeq
      == Seq("k", "amt"))
    assert(spark.sql("SELECT count(*) AS n FROM graft.gold.rpl")
      .head().getLong(0) == 0)
    // REPLACE on a missing table fails; OR REPLACE creates it
    intercept[Exception](spark.sql("REPLACE TABLE graft.gold.rpl_missing (k BIGINT)"))
    spark.sql("CREATE OR REPLACE TABLE graft.gold.rpl_missing (k BIGINT)")
    assert(spark.table("graft.gold.rpl_missing").schema.fieldNames.toSeq
      == Seq("k"))
    // changing the partition layout through REPLACE is rejected loudly
    val e = intercept[Exception](spark.sql(
      "CREATE OR REPLACE TABLE graft.gold.rpl (k BIGINT, v STRING) " +
        "PARTITIONED BY (v)"))
    assert(e.getMessage.contains("partition layout"), e.getMessage)
  }

  test("CALL procedures: optimize, restore, checkpoint, constraints") {
    wh
    spark.sql("CREATE TABLE graft.gold.maint (k BIGINT, v STRING)")
    (1 to 4).foreach(i =>
      spark.sql(s"INSERT INTO graft.gold.maint VALUES ($i, 'x$i')"))
    val t0 = new DeltaLite(spark, s"$wh/gold/maint")
    val before = t0.liveFiles().size
    assert(before >= 4)
    val r = spark.sql("CALL graft.system.optimize('gold.maint')").collect()
    assert(r.head.getString(0).startsWith("compacted"))
    assert(new DeltaLite(spark, s"$wh/gold/maint").liveFiles().size < before)
    assert(spark.table("graft.gold.maint").count() == 4)
    // restore back to two rows
    spark.sql("CALL graft.system.restore('gold.maint', '2')")
    assert(spark.table("graft.gold.maint").count() == 2)
    // checkpoint + constraint surface
    assert(spark.sql("CALL graft.system.checkpoint('gold.maint')")
      .head().getString(0).startsWith("checkpointed"))
    spark.sql("CALL graft.system.add_constraint('gold.maint', 'k_pos', 'k > 0')")
    intercept[Exception](
      spark.sql("INSERT INTO graft.gold.maint VALUES (-1, 'bad')"))
    spark.sql("CALL graft.system.drop_constraint('gold.maint', 'k_pos')")
    spark.sql("INSERT INTO graft.gold.maint VALUES (-1, 'now ok')")
    assert(spark.table("graft.gold.maint").count() == 3)
  }

  test("CALL export_to_delta / convert_from_delta: the zero-copy interop round trip as SQL") {
    wh
    spark.sql("CREATE TABLE graft.gold.exp (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.gold.exp VALUES (1,'a'), (2,'b'), (3,'c')")
    val r = spark.sql("CALL graft.system.export_to_delta('gold.exp')")
      .head().getString(0)
    assert(r.startsWith("exported Delta version 0"), r)
    // the exported _delta_log replays through the interop reader
    assert(graft.etl.DeltaInterop.readDelta(spark, s"$wh/gold/exp")
      .count() == 3)
    // adopt it back, zero copy, via CALL (side root — in-place refuses)
    val side = java.nio.file.Files
      .createTempDirectory("graft-calladopt").toString + "/t"
    val r2 = spark.sql(
      s"CALL graft.system.convert_from_delta('$wh/gold/exp', '$side')")
      .head().getString(0)
    assert(r2.startsWith("adopted"), r2)
    assert(new DeltaLite(spark, side).read().count() == 3)
  }

  test("CALL row_count answers COUNT(*) from metadata; honest unknown under DVs") {
    wh
    spark.sql("CREATE TABLE graft.gold.rc (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.gold.rc VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val r = spark.sql("CALL graft.system.row_count('gold.rc')")
      .head().getString(0)
    assert(r == "3 rows (from metadata)", r)
    // a DELETE leaves deletion vectors live -> honest unknown
    spark.sql("DELETE FROM graft.gold.rc WHERE k = 2")
    val r2 = spark.sql("CALL graft.system.row_count('gold.rc')")
      .head().getString(0)
    assert(r2.startsWith("unknown"), r2)
    // OPTIMIZE folds the DVs and re-records counts
    spark.sql("CALL graft.system.optimize('gold.rc')")
    val r3 = spark.sql("CALL graft.system.row_count('gold.rc')")
      .head().getString(0)
    assert(r3 == "2 rows (from metadata)", r3)
  }

  test("DELETE FROM routes to the deletion-vector path; TRUNCATE keeps history") {
    wh
    spark.sql("CREATE TABLE graft.gold.del (k BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO graft.gold.del VALUES (1,'a'), (2,'b'), (3,'c'), (4,'d')")
    val t = new DeltaLite(spark, s"$wh/gold/del")
    val filesBefore = t.liveFiles().toSet
    spark.sql("DELETE FROM graft.gold.del WHERE k >= 3 AND v != 'd'")
    assert(spark.sql("SELECT k FROM graft.gold.del ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    // merge-on-read: the delete wrote a DV sidecar, no data file moved
    assert(t.liveFiles().toSet == filesBefore,
      "DELETE must not rewrite data files")
    // IN / IS NULL / string predicates translate too
    spark.sql("DELETE FROM graft.gold.del WHERE v IN ('a') OR v LIKE 'd%'")
    assert(spark.sql("SELECT k FROM graft.gold.del").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    val vBefore = t.latestVersion.get
    spark.sql("TRUNCATE TABLE graft.gold.del")
    assert(spark.table("graft.gold.del").count() == 0)
    // pre-truncate snapshot still time-travels
    assert(spark.sql(
      s"SELECT k FROM graft.gold.del VERSION AS OF $vBefore").count() == 1)
    spark.sql("INSERT INTO graft.gold.del VALUES (7, 'post')")
    assert(spark.table("graft.gold.del").count() == 1)
  }

  test("INSERT OVERWRITE PARTITION routes to the replaceWhere atomic swap") {
    wh
    spark.sql("CREATE TABLE graft.gold.iop (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft.gold.iop VALUES (1,'a'), (2,'b'), (3,'a')")
    val t = new DeltaLite(spark, tablePropsPath("graft.gold.iop"))
    val bFilesBefore = t.liveFiles().filter(_.contains("__p_p=b")).toSet
    // replace partition a only
    spark.sql(
      "INSERT OVERWRITE graft.gold.iop PARTITION (p = 'a') VALUES (9L)")
    val got = spark.sql("SELECT k, p FROM graft.gold.iop ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((2L, "b"), (9L, "a")))
    // partition b kept its EXACT files — the swap never touched it
    assert(t.liveFiles().filter(_.contains("__p_p=b")).toSet == bFilesBefore)
    // whole-table INSERT OVERWRITE still replaces everything
    spark.sql("INSERT OVERWRITE graft.gold.iop VALUES (7L, 'z')")
    assert(spark.table("graft.gold.iop").count() == 1)
  }

  private def tablePropsPath(name: String): String =
    spark.sql(s"SHOW TBLPROPERTIES $name").collect()
      .find(_.getString(0) == "graft.location").get.getString(1)

  test("CALL history / detail return row sets (DESCRIBE surface via SQL)") {
    wh
    spark.sql("CREATE TABLE graft.gold.hist (k BIGINT)")
    spark.sql("INSERT INTO graft.gold.hist VALUES (1)")
    spark.sql("INSERT INTO graft.gold.hist VALUES (2)")
    val h = spark.sql("CALL graft.system.history('gold.hist')").collect()
    assert(h.length == 3, "v0 create + two inserts")
    assert(h.map(_.getAs[Int]("version")).toSeq == Seq(2, 1, 0),
      "newest first")
    assert(h.forall(_.getAs[String]("operation") == "append"))
    val d = spark.sql("CALL graft.system.detail('gold.hist')").collect()
    assert(d.length == 1)
    assert(d.head.getAs[Int]("version") == 2)
    assert(d.head.getAs[Long]("size_bytes") > 0L)
  }

  test("external LOCATION tables: register, query, drop keeps the data") {
    wh
    val ext = Files.createTempDirectory("graft-ext-loc").toString
    // CREATE ... LOCATION: data lives at the caller's path
    spark.sql("CREATE TABLE graft.gold.extt (k BIGINT, v STRING) " +
      s"LOCATION '$ext/t1'")
    spark.sql("INSERT INTO graft.gold.extt VALUES (1,'a'), (2,'b')")
    assert(spark.table("graft.gold.extt").count() == 2)
    assert(new java.io.File(s"$ext/t1/_log").exists,
      "commit log lives at the external location")
    // SHOW TABLES lists it; DROP unregisters but keeps the data
    assert(spark.sql("SHOW TABLES IN graft.gold").collect()
      .exists(_.getString(1) == "extt"))
    spark.sql("DROP TABLE graft.gold.extt")
    assert(new java.io.File(s"$ext/t1/_log").exists,
      "DROP on external must not delete the caller's data")
    // re-REGISTER the surviving table under a new name, schema checked
    spark.sql("CREATE TABLE graft.gold.ext2 (k BIGINT, v STRING) " +
      s"LOCATION '$ext/t1'")
    assert(spark.sql("SELECT k FROM graft.gold.ext2 ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // a wrong declared schema is rejected at registration
    spark.sql("DROP TABLE graft.gold.ext2")
    intercept[Exception](spark.sql(
      s"CREATE TABLE graft.gold.ext3 (wrong DOUBLE) LOCATION '$ext/t1'"))
  }

  test("SHOW TABLES omits dangling external pointers (loadTable parity)") {
    wh
    val ext = Files.createTempDirectory("graft-ext-dangle").toString
    spark.sql("CREATE TABLE graft.gold.dang (k BIGINT) " +
      s"LOCATION '$ext/t'")
    assert(spark.sql("SHOW TABLES IN graft.gold").collect()
      .exists(_.getString(1) == "dang"))
    // the external location loses its log out-of-band: every name SHOW
    // TABLES returns must still loadTable, so the dangling pointer
    // disappears from the listing instead of throwing on SELECT
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(s"$ext/t/_log"))
    assert(!spark.sql("SHOW TABLES IN graft.gold").collect()
      .exists(_.getString(1) == "dang"))
    spark.sql("DROP TABLE IF EXISTS graft.gold.dang")
  }

  test("ADD COLUMN NOT NULL is rejected, not silently widened") {
    wh
    spark.sql("CREATE TABLE graft.gold.acnn (k BIGINT)")
    spark.sql("INSERT INTO graft.gold.acnn VALUES (1)")
    val ex = intercept[Exception](spark.sql(
      "ALTER TABLE graft.gold.acnn ADD COLUMNS (s STRING NOT NULL)"))
    assert(ex.getMessage.contains("NOT NULL"))
  }

  test("CALL table_changes returns the capped CDC slice") {
    wh
    spark.sql("CREATE TABLE graft.gold.cdc (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.gold.cdc VALUES (1,'a'), (2,'b')")
    spark.sql("DELETE FROM graft.gold.cdc WHERE k = 1")
    val ch = spark.sql(
      "CALL graft.system.table_changes('gold.cdc', '0', '2', '100')")
      .collect()
    val byType = ch.groupBy(_.getAs[String]("_change_type"))
      .view.mapValues(_.length).toMap
    assert(byType == Map("insert" -> 2, "delete" -> 1))
    val capped = spark.sql(
      "CALL graft.system.table_changes('gold.cdc', '0', '2', '1')")
      .collect()
    assert(capped.length == 1, "max_rows caps the audit slice")
  }

  test("ALTER TABLE ADD COLUMNS: data-free widen, old rows read null") {
    wh
    spark.sql("CREATE TABLE graft.gold.ac (k BIGINT)")
    spark.sql("INSERT INTO graft.gold.ac VALUES (1), (2)")
    val preAdd = new DeltaLite(spark, tablePropsPath("graft.gold.ac"))
      .latestVersion.get
    spark.sql("ALTER TABLE graft.gold.ac ADD COLUMNS (score DOUBLE)")
    // old rows read the new column as null; new shape inserts work
    spark.sql("INSERT INTO graft.gold.ac VALUES (3, 9.5)")
    val got = spark.sql("SELECT k, score FROM graft.gold.ac ORDER BY k")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSeq
    assert(got == Seq((1L, None), (2L, None), (3L, Some(9.5))))
    // UPDATE can fill the widened column
    spark.sql("UPDATE graft.gold.ac SET score = 1.0 WHERE k = 1")
    assert(spark.sql(
      "SELECT score FROM graft.gold.ac WHERE k = 1").head().getDouble(0) == 1.0)
    // time travel below the widen keeps the narrow schema
    assert(spark.sql(
      s"SELECT * FROM graft.gold.ac VERSION AS OF $preAdd")
      .schema.fieldNames.toSeq == Seq("k"))
  }

  test("CALL optimize_where / vacuum_orphans / clone") {
    wh
    spark.sql("CREATE TABLE graft.gold.mx (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    (0 until 3).foreach(i => spark.sql(
      s"INSERT INTO graft.gold.mx VALUES ($i, 'a'), (${i + 10}, 'b')"))
    // partition-scoped OPTIMIZE: only partition a's files compact
    val t = new DeltaLite(spark, tablePropsPath("graft.gold.mx"))
    val bBefore = t.liveFiles().filter(_.contains("__p_p=b")).toSet
    val r = spark.sql(
      "CALL graft.system.optimize_where('gold.mx', \"p = 'a'\")")
      .collect().head.getString(0)
    assert(r.startsWith("compacted at v"))
    assert(t.liveFiles().filter(_.contains("__p_p=b")).toSet == bBefore,
      "partition b untouched by the scoped compact")
    assert(t.liveFiles().count(_.contains("__p_p=a")) == 1,
      "partition a bin-packed to one file")
    assert(spark.table("graft.gold.mx").count() == 6)
    // orphan sweep runs (nothing to remove here)
    val v = spark.sql("CALL graft.system.vacuum_orphans('gold.mx')")
      .collect().head.getString(0)
    assert(v.startsWith("removed"))
    // shallow clone to a NEW named table — instantly queryable
    spark.sql("CALL graft.system.clone('gold.mx', 'gold.mx_dev', 'shallow')")
    assert(spark.table("graft.gold.mx_dev").count() == 6)
    // clone writes don't touch the source
    spark.sql("INSERT INTO graft.gold.mx_dev VALUES (99, 'z')")
    assert(spark.table("graft.gold.mx").count() == 6)
    assert(spark.table("graft.gold.mx_dev").count() == 7)
  }

  test("CALL analyze lights up multi-column skipping via SQL") {
    wh
    spark.sql("CREATE TABLE graft.gold.an (k BIGINT, w BIGINT)")
    (0 until 4).foreach(i => spark.sql(
      s"INSERT INTO graft.gold.an VALUES (${i * 10}, ${i * 100})"))
    spark.sql("CALL graft.system.analyze('gold.an', 'w')")
    val df = spark.sql("SELECT k FROM graft.gold.an WHERE w = 200")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(20L))
    // 1 matching file + the CREATE TABLE commit's 0-row file (null
    // stats are conservatively kept); the other 3 data files prune
    assert(scannedFiles(df) <= 2, "analyzed column must prune the misses")
  }
}
