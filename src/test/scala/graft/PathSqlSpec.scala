package graft

import graft.etl.DeltaLite
import java.nio.file.Files

/** Delta's `delta.`/path`` SQL addressing, graft-flavored: a
  * backquoted absolute path in table position works for reads, time
  * travel, DML and the maintenance verbs — no registration step. The
  * managed verbs (CREATE/DROP/RENAME) refuse: the path IS the table.
  */
class PathSqlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val setup: Unit =
    graft.catalog.GraftCatalog.install(spark,
      Files.createTempDirectory("graft-pathsql-wh").toString)

  private def freshTable(): String = {
    setup
    val root = Files.createTempDirectory("graft-pathsql").toString + "/t"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .write.format("delta-lite").mode("append").save(root)
    root
  }

  test("SELECT and time travel on graft.`/path`") {
    val root = freshTable()
    assert(spark.sql(s"SELECT count(*) FROM graft.`$root`")
      .head.getLong(0) == 3)
    spark.sql(s"INSERT INTO graft.`$root` VALUES (4, 'd')")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$root`")
      .head.getLong(0) == 4)
    assert(spark.sql(s"SELECT count(*) FROM graft.`$root` VERSION AS OF 0")
      .head.getLong(0) == 3)
  }

  test("UPDATE / DELETE / MERGE on graft.`/path`") {
    val root = freshTable()
    spark.sql(s"UPDATE graft.`$root` SET v = 'A' WHERE k = 1")
    spark.sql(s"DELETE FROM graft.`$root` WHERE k = 3")
    spark.sql(s"MERGE INTO graft.`$root` t USING (SELECT 2L AS k, 'B' AS v) s " +
      "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v " +
      "WHEN NOT MATCHED THEN INSERT *")
    val got = spark.sql(s"SELECT k, v FROM graft.`$root` ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "A"), (2L, "B")), got)
  }

  test("maintenance verbs accept the path spelling") {
    val root = freshTable()
    spark.sql(s"INSERT INTO graft.`$root` VALUES (9, 'z')")
    assert(spark.sql(s"DESCRIBE HISTORY graft.`$root`").count() >= 2)
    assert(spark.sql(s"OPTIMIZE graft.`$root`").head.getString(0)
      .startsWith("compacted"))
    assert(spark.sql(s"VACUUM graft.`$root` RETAIN 168 HOURS")
      .head.getString(0) == "removed 0 files")
    // the skipping index reaches path tables too
    assert(spark.sql(s"ANALYZE TABLE graft.`$root` COMPUTE STATISTICS " +
      "FOR COLUMNS k").head.getString(0).startsWith("analyzed"))
  }

  test("managed verbs refuse: the path is the table") {
    val root = freshTable()
    val d = intercept[Exception](spark.sql(s"DROP TABLE graft.`$root`"))
    assert(d.getMessage.contains("unmanaged"), d.getMessage)
    val c = intercept[Exception](
      spark.sql("CREATE TABLE graft.`/tmp/graft-pathsql-nope` (k BIGINT)"))
    assert(c.getMessage.contains("unmanaged"), c.getMessage)
    // reads of a path with no table stay loud
    intercept[Exception](
      spark.sql("SELECT * FROM graft.`/tmp/graft-pathsql-missing`").collect())
    // the refusal deleted nothing: the table still reads
    assert(DeltaLite(spark, root).read().count() == 3)
  }
}
