package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** CLUSTER BY (liquid-clustering-style layout hint) + TBLPROPERTIES
  * declared at CREATE: both arrive through the DSv2 createTable /
  * staged-CTAS paths and must persist like their post-hoc ALTER
  * equivalents.
  */
class ClusterBySpec extends SparkSpec {

  private lazy val setup: Unit = {
    graft.catalog.GraftCatalog.install(spark,
      Files.createTempDirectory("graft-cluster-wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cl")
  }

  test("TBLPROPERTIES at CREATE persist (CDF enabled from birth)") {
    setup
    spark.sql("CREATE TABLE graft.cl.p (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('enableChangeDataFeed' = 'true', 'team' = 'data')")
    val props = spark.sql("SHOW TBLPROPERTIES graft.cl.p").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("enableChangeDataFeed").contains("true"), props)
    assert(props.get("team").contains("data"), props)
    // the feed works from the very first DML — no SET TBLPROPERTIES gap
    spark.sql("INSERT INTO graft.cl.p VALUES (1, 'a')")
    spark.sql("UPDATE graft.cl.p SET v = 'A' WHERE k = 1")
    val feed = spark.read.option("readChangeFeed", "true")
      .option("startingVersion", 0).table("graft.cl.p")
      .select("v", "_change_type").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(feed == Set(("a", "insert"), ("a", "update_preimage"),
      ("A", "update_postimage")), feed)
  }

  test("CTAS TBLPROPERTIES persist through the staged path") {
    setup
    spark.sql("CREATE TABLE graft.cl.c TBLPROPERTIES ('origin' = 'ctas') " +
      "AS SELECT 1L AS k, 'a' AS v")
    val props = spark.sql("SHOW TBLPROPERTIES graft.cl.c").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("origin").contains("ctas"), props)
    assert(spark.table("graft.cl.c").count() == 1)
  }

  test("CLUSTER BY: stored, printed by SHOW CREATE TABLE, applied by OPTIMIZE") {
    setup
    spark.sql("CREATE TABLE graft.cl.z (a BIGINT, b BIGINT, pad STRING) " +
      "CLUSTER BY (a, b)")
    // the declaration round-trips through TBLPROPERTIES (surfacing it
    // as a partitioning transform would make SHOW CREATE TABLE print
    // a misleading PARTITIONED BY)
    val ddl = spark.sql("SHOW CREATE TABLE graft.cl.z").head.getString(0)
    assert(ddl.contains("'clusteringColumns' = 'a,b'"), ddl)
    assert(!ddl.contains("PARTITIONED BY"), ddl)
    // many small unclustered appends
    (0 until 4).foreach { i =>
      spark.range(i * 2500, (i + 1) * 2500)
        .selectExpr("id % 100 AS a", "cast(id / 100 AS BIGINT) AS b",
          "repeat('x', 20) AS pad")
        .writeTo("graft.cl.z").append()
    }
    // plain OPTIMIZE re-clusters on the DECLARED columns — no ZORDER
    // BY clause needed
    val msg = spark.sql("OPTIMIZE graft.cl.z").head.getString(0)
    assert(msg.startsWith("clustered"), msg)
    // clustering pays off: a point predicate on (a, b) scans a strict
    // subset of the files
    val total = spark.table("graft.cl.z")
      .select(input_file_name()).distinct().count()
    val touched = spark.table("graft.cl.z")
      .where(col("a") === 7 && col("b") === 13)
      .select(input_file_name()).distinct().count()
    assert(total > 4 && touched < total, s"touched=$touched total=$total")
  }

  test("autoCompact property folds small files on the write path") {
    setup
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-autocompact").toString + "/t"
    val t = new graft.etl.DeltaLite(spark, root)
    t.append(Seq((0L, "z")).toDF("k", "v"))
    t.setTableProperties(Map(
      "autoCompact" -> "true", "autoCompact.minFiles" -> "4"))
    (1 to 5).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("k", "v")))
    val live = t.liveFileSizes().size
    assert(live < 5, s"autoCompact should fold the small files, live=$live")
    assert(t.read().count() == 6) // rows survive the folding
    // off by default: a fresh table accumulates files untouched
    val u = new graft.etl.DeltaLite(spark,
      java.nio.file.Files.createTempDirectory("graft-noac").toString + "/t")
    (1 to 5).foreach(i => u.append(Seq((i.toLong, s"v$i")).toDF("k", "v")))
    assert(u.liveFileSizes().size >= 5)
  }

  test("REPLACE TABLE keeps the clustering declaration") {
    setup
    spark.sql("CREATE TABLE graft.cl.r (a BIGINT, v STRING) CLUSTER BY (a)")
    spark.sql("INSERT INTO graft.cl.r VALUES (1, 'x')")
    spark.sql("CREATE OR REPLACE TABLE graft.cl.r (a BIGINT, v STRING)")
    assert(spark.table("graft.cl.r").count() == 0)
    // properties (incl. clusteringColumns) survive a REPLACE by design
    val props = spark.sql("SHOW TBLPROPERTIES graft.cl.r").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("clusteringColumns").contains("a"), props)
    assert(spark.sql("OPTIMIZE graft.cl.r").head.getString(0)
      .startsWith("clustered"))
  }
}
