package graft

import java.nio.file.Files

/** Delta-verbatim maintenance SQL through the injected parser:
  * OPTIMIZE [WHERE | ZORDER BY], VACUUM [RETAIN n VERSIONS],
  * DESCRIBE HISTORY / DETAIL, RESTORE ... VERSION AS OF — each
  * translating to the existing CALL procedure, with the full Spark
  * dialect untouched for everything else.
  */
class MaintenanceSqlSpec extends SparkSpec {

  private lazy val setup: Unit = {
    graft.catalog.GraftCatalog.install(spark,
      Files.createTempDirectory("graft-maint-wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.m")
  }

  test("OPTIMIZE / VACUUM / DESCRIBE HISTORY / RESTORE run verbatim") {
    setup
    spark.sql("CREATE TABLE graft.m.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.m.t VALUES (1, 'a')")
    spark.sql("INSERT INTO graft.m.t VALUES (2, 'b')")
    spark.sql("INSERT INTO graft.m.t VALUES (3, 'c')")
    // OPTIMIZE compacts the small files
    val opt = spark.sql("OPTIMIZE graft.m.t").collect()
    assert(opt.head.getString(0).startsWith("compacted"), opt.toSeq)
    assert(spark.sql("SELECT count(*) AS n FROM graft.m.t")
      .head().getLong(0) == 3)
    // DESCRIBE HISTORY returns the commit rows
    val hist = spark.sql("DESCRIBE HISTORY graft.m.t").collect()
    assert(hist.length >= 4, s"expected full history, got ${hist.length}")
    // DESC DETAIL works too
    assert(spark.sql("DESC DETAIL graft.m.t").collect().nonEmpty)
    // RESTORE TABLE ... TO VERSION AS OF rolls back (v0 is the empty
    // CREATE commit, v1/v2/v3 the three single-row inserts)
    spark.sql("RESTORE TABLE graft.m.t TO VERSION AS OF 2")
    assert(spark.sql("SELECT count(*) AS n FROM graft.m.t")
      .head().getLong(0) == 2)
    // the TO-less / TABLE-less Delta spelling parses too
    spark.sql("RESTORE graft.m.t VERSION AS OF 1")
    assert(spark.sql("SELECT count(*) AS n FROM graft.m.t")
      .head().getLong(0) == 1)
    // VACUUM reclaims unreferenced files, current state intact
    spark.sql("VACUUM graft.m.t")
    assert(spark.sql("SELECT count(*) AS n FROM graft.m.t")
      .head().getLong(0) == 1)
    // RETAIN n HOURS maps onto version retention via commit-record
    // times (a fresh table, so the earlier vacuum can't skew it):
    // everything committed seconds ago, so a week-wide window retains
    // every version — deletes nothing, time travel below stays alive
    spark.sql("CREATE TABLE graft.m.h (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.m.h VALUES (1, 'a')")
    spark.sql("INSERT OVERWRITE graft.m.h VALUES (2, 'b')")
    assert(spark.sql("VACUUM graft.m.h RETAIN 168 HOURS").head.getString(0)
      == "removed 0 files")
    assert(spark.sql("SELECT count(*) AS n FROM graft.m.h VERSION AS OF 1")
      .head().getLong(0) == 1)
    // …and a zero-hour window retains only the current version: the
    // dry run lists exactly the overwrite's orphans
    assert(spark.sql("VACUUM graft.m.h RETAIN 0 HOURS DRY RUN").count() > 0)
    assert(spark.sql("SELECT count(*) AS n FROM graft.m.h VERSION AS OF 1")
      .head().getLong(0) == 1) // the dry run deleted nothing
  }

  test("RESTORE TABLE ... TO TIMESTAMP AS OF resolves like a timestamp read") {
    setup
    spark.sql("CREATE TABLE graft.m.rts (k BIGINT)")
    spark.sql("INSERT INTO graft.m.rts VALUES (1)")
    Thread.sleep(30) // separate the commit-record mtimes
    val mark = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(30)
    spark.sql("INSERT INTO graft.m.rts VALUES (2), (3)")
    assert(spark.sql("SELECT count(*) FROM graft.m.rts").head.getLong(0) == 3)
    val msg = spark.sql(
      s"RESTORE TABLE graft.m.rts TO TIMESTAMP AS OF '$mark'").head.getString(0)
    assert(msg.startsWith("restored"), msg)
    assert(spark.sql("SELECT count(*) FROM graft.m.rts").head.getLong(0) == 1)
    // a pre-creation timestamp fails loudly
    val e = intercept[Exception](spark.sql(
      "RESTORE graft.m.rts TIMESTAMP AS OF '1999-01-01 00:00:00'"))
    assert(e.getMessage.contains("younger"), e.getMessage)
  }

  test("OPTIMIZE ZORDER BY and OPTIMIZE WHERE route to their procedures") {
    setup
    spark.sql("CREATE TABLE graft.m.z (a BIGINT, b BIGINT)")
    (0 until 4).foreach(i =>
      spark.sql(s"INSERT INTO graft.m.z SELECT id * 7 % 64, id * 13 % 64 " +
        s"FROM range(${i * 50}, ${i * 50 + 50})"))
    val z = spark.sql("OPTIMIZE graft.m.z ZORDER BY (a, b)").collect()
    assert(z.head.getString(0).startsWith("clustered"), z.toSeq)
    assert(spark.sql("SELECT count(*) AS n FROM graft.m.z")
      .head().getLong(0) == 200)
    // one column (range-cluster degenerate) and three columns
    val z1 = spark.sql("OPTIMIZE graft.m.z ZORDER BY (a)").collect()
    assert(z1.head.getString(0).startsWith("clustered"), z1.toSeq)
    spark.sql("ALTER TABLE graft.m.z ADD COLUMNS (c BIGINT)")
    val z3 = spark.sql("OPTIMIZE graft.m.z ZORDER BY (a, b, c)").collect()
    assert(z3.head.getString(0).startsWith("clustered"), z3.toSeq)
    assert(spark.sql("SELECT count(*) AS n FROM graft.m.z")
      .head().getLong(0) == 200)
    // partitioned table + OPTIMIZE WHERE
    spark.sql("CREATE TABLE graft.m.p (k BIGINT, d STRING) PARTITIONED BY (d)")
    spark.sql("INSERT INTO graft.m.p VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft.m.p VALUES (3, 'a'), (4, 'b')")
    val w = spark.sql("OPTIMIZE graft.m.p WHERE d = 'a'").collect()
    assert(w.head.getString(0).startsWith("compacted"), w.toSeq)
    assert(spark.sql("SELECT count(*) AS n FROM graft.m.p")
      .head().getLong(0) == 4)
  }

  test("CREATE TABLE ... SHALLOW/DEEP CLONE runs verbatim") {
    setup
    spark.sql("CREATE TABLE graft.m.src (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.m.src VALUES (1, 'a'), (2, 'b')")
    spark.sql("CREATE TABLE graft.m.dev SHALLOW CLONE graft.m.src")
    assert(spark.sql("SELECT count(*) AS n FROM graft.m.dev")
      .head().getLong(0) == 2)
    spark.sql("CREATE TABLE graft.m.bak DEEP CLONE graft.m.src")
    assert(spark.sql("SELECT count(*) AS n FROM graft.m.bak")
      .head().getLong(0) == 2)
    // clones are independent: writes to the clone leave the source
    spark.sql("INSERT INTO graft.m.dev VALUES (3, 'c')")
    assert(spark.sql("SELECT count(*) AS n FROM graft.m.src")
      .head().getLong(0) == 2)
  }

  test("column DEFAULT values fill at INSERT through the analyzer") {
    setup
    spark.sql("CREATE TABLE graft.m.dflt (" +
      "k BIGINT, status STRING DEFAULT 'new', n BIGINT DEFAULT 0)")
    spark.sql("INSERT INTO graft.m.dflt (k) VALUES (1)")
    spark.sql("INSERT INTO graft.m.dflt VALUES (2, 'done', 5)")
    spark.sql("INSERT INTO graft.m.dflt (k, status) VALUES (3, DEFAULT)")
    val got = spark.sql(
      "SELECT k, status, n FROM graft.m.dflt ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "new", 0L), (2L, "done", 5L), (3L, "new", 0L)),
      s"got $got")
  }

  test("the rest of the dialect is untouched") {
    setup
    // statements that merely CONTAIN the keywords still parse normally
    assert(spark.sql("SELECT 'OPTIMIZE graft.m.t' AS s").head().getString(0)
      == "OPTIMIZE graft.m.t")
    spark.sql("CREATE TABLE graft.m.vacuum (k BIGINT)")
    spark.sql("INSERT INTO graft.m.vacuum VALUES (7)")
    assert(spark.sql("SELECT k FROM graft.m.vacuum").head().getLong(0) == 7)
  }
}
