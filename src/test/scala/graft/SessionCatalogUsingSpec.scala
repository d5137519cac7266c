package graft

import graft.etl.DeltaLite
import java.nio.file.Files

/** `CREATE TABLE … USING delta-lite LOCATION '/path'` in the plain
  * SESSION catalog — no graft catalog registration needed: the
  * metastore entry carries the provider + location, reads resolve
  * through the TableProvider to the substituted skipping scan, and
  * row-level DML routes through the same GraftDml conversions as
  * graft-catalog tables. Managed (LOCATION-less) entries are rejected
  * loudly at CREATE: the session catalog cannot hand the provider a
  * path, and a table we cannot locate would be a silent lie.
  */
class SessionCatalogUsingSpec extends SparkSpec {
  import spark.implicits._

  test("full lifecycle through the session catalog") {
    val root = Files.createTempDirectory("graft-using").toString + "/t"
    spark.sql("CREATE TABLE sc_dl (k BIGINT, v STRING) " +
      s"USING `delta-lite` LOCATION '$root'")
    spark.sql("INSERT INTO sc_dl VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("SELECT count(*) FROM sc_dl").head.getLong(0) == 2)
    // row-level DML routes through the connector paths
    spark.sql("UPDATE sc_dl SET v = 'A' WHERE k = 1")
    spark.sql("DELETE FROM sc_dl WHERE k = 2")
    assert(spark.sql("SELECT k, v FROM sc_dl").as[(Long, String)]
      .collect().toSeq == Seq((1L, "A")))
    // version history is real: the reader option reaches the snapshot
    assert(spark.read.format("delta-lite").option("versionAsOf", 1)
      .load(root).count() == 2)
    // DROP unregisters; the data stays at the caller's path
    spark.sql("DROP TABLE sc_dl")
    assert(DeltaLite(spark, root).latestVersion.nonEmpty)
    assert(DeltaLite(spark, root).read().count() == 1)
  }

  test("managed (LOCATION-less) entries fail loudly at CREATE") {
    val e = intercept[Exception](
      spark.sql("CREATE TABLE sc_dl_managed (k BIGINT) USING `delta-lite`"))
    assert(e.getMessage.contains("needs a single path"), e.getMessage)
  }
}
