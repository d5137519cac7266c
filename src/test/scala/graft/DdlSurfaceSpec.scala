package graft

import java.nio.file.Files

/** The round-7 verbatim DDL surface: ALTER TABLE ADD/DROP CONSTRAINT
  * through Spark's own constraint grammar (DSv2 `SUPPORT_TABLE_
  * CONSTRAINT` + the GraftDml conversion), SHOW PARTITIONS via
  * `SupportsPartitionManagement`, and the maintenance verbs ANALYZE
  * TABLE, VACUUM … DRY RUN, FSCK REPAIR TABLE and CONVERT TO DELTA.
  */
class DdlSurfaceSpec extends SparkSpec {

  private lazy val setup: Unit = {
    graft.catalog.GraftCatalog.install(spark,
      Files.createTempDirectory("graft-ddl-wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.d")
  }

  test("ALTER TABLE ADD CONSTRAINT: verbatim SQL, enforced, dropped") {
    setup
    spark.sql("CREATE TABLE graft.d.c (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.d.c VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE graft.d.c ADD CONSTRAINT kpos CHECK (k > 0)")
    // Spark's own analyzer enforcement (from Table.constraints())
    // rejects the violating insert before any file lands
    val before = spark.sql("SELECT count(*) FROM graft.d.c").head.getLong(0)
    val e = intercept[Exception](
      spark.sql("INSERT INTO graft.d.c VALUES (-5, 'x')"))
    assert(e.getMessage.contains("kpos"), e.getMessage)
    assert(spark.sql("SELECT count(*) FROM graft.d.c").head.getLong(0)
      == before)
    // SHOW CREATE TABLE prints the constraint
    val ddl = spark.sql("SHOW CREATE TABLE graft.d.c").head.getString(0)
    assert(ddl.contains("kpos") && ddl.contains("CHECK"), ddl)
    // adding a constraint the existing data violates fails loudly
    val bad = intercept[Exception](
      spark.sql("ALTER TABLE graft.d.c ADD CONSTRAINT kbig CHECK (k > 1)"))
    assert(bad.getMessage.contains("kbig"), bad.getMessage)
    // DROP CONSTRAINT; the insert then passes
    spark.sql("ALTER TABLE graft.d.c DROP CONSTRAINT kpos")
    spark.sql("ALTER TABLE graft.d.c DROP CONSTRAINT IF EXISTS nope")
    intercept[Exception](
      spark.sql("ALTER TABLE graft.d.c DROP CONSTRAINT nope"))
    spark.sql("INSERT INTO graft.d.c VALUES (-5, 'x')")
    assert(spark.sql("SELECT count(*) FROM graft.d.c").head.getLong(0)
      == before + 1)
  }

  test("SHOW PARTITIONS lists live partition tuples, filter works") {
    setup
    spark.sql(
      "CREATE TABLE graft.d.p (k BIGINT, part STRING) PARTITIONED BY (part)")
    spark.sql("INSERT INTO graft.d.p VALUES (1, 'a'), (2, 'b'), (3, 'b')")
    val parts = spark.sql("SHOW PARTITIONS graft.d.p")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(parts == Seq("part=a", "part=b"), parts)
    val filtered = spark.sql("SHOW PARTITIONS graft.d.p PARTITION (part='b')")
      .collect().map(_.getString(0)).toSeq
    assert(filtered == Seq("part=b"), filtered)
    // the listing tracks the LIVE set: overwrite to a single partition
    spark.sql("INSERT OVERWRITE graft.d.p VALUES (9, 'z')")
    assert(spark.sql("SHOW PARTITIONS graft.d.p")
      .collect().map(_.getString(0)).toSeq == Seq("part=z"))
    // partitions are derived from files — ADD/DROP PARTITION refuse
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE graft.d.p ADD PARTITION (part='q')"))
    assert(e.getMessage.contains("derived from file paths"), e.getMessage)
  }

  test("ANALYZE TABLE: all three forms route to restats; non-graft names delegate") {
    setup
    spark.sql("CREATE TABLE graft.d.a (k BIGINT, v STRING, arr ARRAY<INT>)")
    spark.sql("INSERT INTO graft.d.a VALUES (1, 'x', array(1)), (2, 'y', array(2))")
    val r1 = spark.sql("ANALYZE TABLE graft.d.a COMPUTE STATISTICS")
      .head.getString(0)
    assert(r1.startsWith("analyzed"), r1) // k and v; arr skipped (non-atomic)
    val r2 = spark.sql(
      "ANALYZE TABLE graft.d.a COMPUTE STATISTICS FOR COLUMNS k").head.getString(0)
    assert(r2.startsWith("analyzed"), r2)
    val r3 = spark.sql(
      "ANALYZE TABLE graft.d.a COMPUTE STATISTICS NOSCAN").head.getString(0)
    assert(r3.startsWith("noop"), r3)
    // the skipping index now prunes on v: plan-level proof that the
    // analyze reached the stats (1 of N files for a point lookup)
    // — restats behavior itself is covered by MultiStatsSpec; here we
    // only assert the SQL routed.
    // a session-catalog name must NOT be hijacked: Spark's own error
    // (or success) surfaces, not a graft CALL failure
    val e = intercept[Exception](
      spark.sql("ANALYZE TABLE no_such_db.no_such_t COMPUTE STATISTICS"))
    assert(!e.getMessage.contains("graft.system"), e.getMessage)
  }

  test("VACUUM DRY RUN lists exactly what VACUUM would delete, deletes nothing") {
    setup
    spark.sql("CREATE TABLE graft.d.v (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.d.v VALUES (1, 'a')")
    spark.sql("INSERT OVERWRITE graft.d.v VALUES (2, 'b')")
    val listed = spark.sql("VACUUM graft.d.v DRY RUN")
      .collect().map(_.getString(0)).toSet
    assert(listed.nonEmpty, "overwrite must orphan the v1 files")
    // retained window covers everything → nothing to delete
    assert(spark.sql("VACUUM graft.d.v RETAIN 10 VERSIONS DRY RUN").count() == 0)
    // dry run deleted nothing: time travel to v1 still works
    assert(spark.sql("SELECT count(*) FROM graft.d.v VERSION AS OF 1")
      .head.getLong(0) == 1)
    // the real vacuum deletes exactly the dry-run list
    val deleted = spark.sql("VACUUM graft.d.v")
      .head.getString(0)
    assert(deleted == s"removed ${listed.size} files", deleted)
  }

  test("FSCK REPAIR TABLE drops refs to out-of-band-deleted files") {
    setup
    spark.sql("CREATE TABLE graft.d.f (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.d.f VALUES (1, 'a')")
    spark.sql("INSERT INTO graft.d.f VALUES (2, 'b')")
    assert(spark.sql("FSCK REPAIR TABLE graft.d.f DRY RUN").count() == 0)
    val loc = spark.sql("DESC DETAIL graft.d.f").head.getString(0)
    val live = graft.etl.DeltaLite(spark, loc).liveFileSizes().map(_._1)
    // the v1 commit's file holds row (1, 'a') — losing it must cost
    // exactly that row
    val doomed = live.find(_.contains("/v=1-")).get
    val victim = new java.io.File(new java.net.URI(doomed).getPath)
    assert(victim.delete(), s"could not delete $victim")
    // dry run reports, repairs nothing — reads still fail
    val dry = spark.sql("FSCK REPAIR TABLE graft.d.f DRY RUN")
      .collect().map(_.getString(0)).toSeq
    assert(dry.size == 1, s"victim=$victim dry=$dry live=$live")
    intercept[Exception](spark.sql("SELECT count(*) FROM graft.d.f").collect())
    // repair publishes one commit dropping the ref; reads work again
    val repaired = spark.sql("FSCK REPAIR TABLE graft.d.f")
      .collect().map(_.getString(0)).toSeq
    assert(repaired.size == 1 && doomed.endsWith(
      repaired.head.split('/').last), repaired)
    assert(spark.sql("SELECT count(*) FROM graft.d.f").head.getLong(0) == 1)
  }

  test("CONVERT TO DELTA adopts a parquet directory in place") {
    setup
    val dir = Files.createTempDirectory("graft-ddl-conv").toString + "/plain"
    spark.range(20).selectExpr("id AS k", "id * 2 AS d")
      .repartition(4).write.parquet(dir)
    val msg = spark.sql(s"CONVERT TO DELTA parquet.`$dir`").head.getString(0)
    assert(msg.startsWith("converted"), msg)
    // the adopted table reads through the DeltaLite path API…
    val t = graft.etl.DeltaLite(spark, dir)
    assert(t.read().count() == 20)
    // …and as an external LOCATION catalog table
    spark.sql(s"CREATE TABLE graft.d.conv LOCATION '$dir'")
    assert(spark.sql("SELECT sum(d) FROM graft.d.conv").head.getLong(0)
      == (0 until 20).map(_ * 2).sum)
    // NO STATISTICS variant parses; re-convert refuses (already a table)
    val e = intercept[Exception](
      spark.sql(s"CONVERT TO DELTA parquet.`$dir` NO STATISTICS"))
    assert(e.getMessage.contains("already"), e.getMessage)
    // hive-partitioned sources are rejected loudly at parse
    val p = intercept[Exception](spark.sql(
      "CONVERT TO DELTA parquet.`/tmp/x` PARTITIONED BY (d INT)"))
    assert(p.getMessage.contains("PARTITIONED BY is unsupported"),
      p.getMessage)
  }
}
