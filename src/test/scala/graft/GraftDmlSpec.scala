package graft

import graft.catalog.GraftCatalog
import graft.etl.DeltaLite
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** SQL UPDATE / MERGE INTO on catalog tables (the GraftDml conversion
  * rule) plus the underlying DeltaLite.updateWhere / assignment-form
  * merge: file granularity, deletion-vector interplay, constraint
  * gating, and the documented rejection shapes.
  */
class GraftDmlSpec extends SparkSpec {
  import spark.implicits._

  // the graft catalog instance is cached per session after first
  // lookup, so an earlier suite's install wins the warehouse conf —
  // resolve each table's REAL location from its catalog properties
  // instead of assuming this install's directory
  private lazy val wh: Unit = {
    GraftCatalog.install(spark,
      Files.createTempDirectory("graft-dml-wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
  }

  private def tablePath(name: String): String =
    spark.sql(s"SHOW TBLPROPERTIES $name").collect()
      .find(_.getString(0) == "graft.location").get.getString(1)

  test("UPDATE: multi-assignment, expressions, WHERE; file-granular rewrite") {
    wh
    spark.sql("CREATE TABLE graft.dml.u (k BIGINT, v STRING, n BIGINT)")
    // two separate inserts → two data files with disjoint key ranges
    spark.sql("INSERT INTO graft.dml.u VALUES (1,'a',10), (2,'b',20)")
    spark.sql("INSERT INTO graft.dml.u VALUES (5,'e',50), (6,'f',60)")
    val t = new DeltaLite(spark, tablePath("graft.dml.u"))
    val before = t.liveFiles().toSet
    spark.sql("UPDATE graft.dml.u SET v = upper(v), n = n + 1 WHERE k >= 5")
    val got = spark.sql("SELECT * FROM graft.dml.u ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "a", 10L), (2L, "b", 20L),
      (5L, "E", 51L), (6L, "F", 61L)))
    // only the file containing k>=5 was rewritten
    val after = t.liveFiles().toSet
    assert((before intersect after).nonEmpty,
      "the unmatched file must survive the update untouched")
    assert(after != before, "the matched file must be rewritten")
  }

  test("UPDATE with no matches publishes no commit") {
    wh
    spark.sql("CREATE TABLE graft.dml.unm (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.dml.unm VALUES (1,'a')")
    val t = new DeltaLite(spark, tablePath("graft.dml.unm"))
    val v = t.latestVersion
    spark.sql("UPDATE graft.dml.unm SET v = 'x' WHERE k > 100")
    assert(t.latestVersion == v, "no-match update must not commit")
  }

  test("UPDATE does not resurrect deletion-vector'd rows") {
    wh
    spark.sql("CREATE TABLE graft.dml.dv (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.dml.dv VALUES (1,'a'), (2,'b'), (3,'c')")
    spark.sql("DELETE FROM graft.dml.dv WHERE k = 2")
    // the update rewrites the file holding k=1..3; row 2 must stay dead
    spark.sql("UPDATE graft.dml.dv SET v = 'z' WHERE k >= 1")
    val got = spark.sql("SELECT k, v FROM graft.dml.dv ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "z"), (3L, "z")))
  }

  test("MERGE: conditional update/insert assignment clauses + DELETE clause") {
    wh
    spark.sql("CREATE TABLE graft.dml.m (k BIGINT, v STRING, n BIGINT)")
    spark.sql("INSERT INTO graft.dml.m VALUES (1,'a',10), (2,'b',20), (3,'c',30)")
    // int source key: the analyzer's implicit cast on the ON clause
    // must be tolerated
    spark.sql("""MERGE INTO graft.dml.m t USING
      (SELECT * FROM VALUES (2,'mm',900L), (3,'skip',-1L), (9,'new',90L)
        AS s(id, vv, nn)) s
      ON t.k = s.id
      WHEN MATCHED AND s.nn > 0 THEN UPDATE SET v = s.vv, n = s.nn + t.n
      WHEN NOT MATCHED AND s.nn > 0 THEN INSERT (k, v, n) VALUES (s.id, s.vv, s.nn)""")
    val got = spark.sql("SELECT * FROM graft.dml.m ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "a", 10L), (2L, "mm", 920L),
      (3L, "c", 30L), (9L, "new", 90L)),
      "conditioned-out matched row keeps its target values")
    // DELETE-only merge: source carries none of the table's columns
    spark.sql("""MERGE INTO graft.dml.m t USING
      (SELECT * FROM VALUES (1,'D'), (9,'D'), (77,'D') AS s(id, op)) s
      ON t.k = s.id
      WHEN MATCHED AND s.op = 'D' THEN DELETE""")
    assert(spark.sql("SELECT k FROM graft.dml.m ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(2L, 3L))
  }

  test("MERGE UPDATE SET * / INSERT * expand through resolution") {
    wh
    spark.sql("CREATE TABLE graft.dml.star (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.dml.star VALUES (1,'a'), (2,'b')")
    spark.sql("""MERGE INTO graft.dml.star t USING
      (SELECT * FROM VALUES (2L,'B2'), (3L,'C') AS s(k, v)) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val got = spark.sql("SELECT * FROM graft.dml.star ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "B2"), (3L, "C")))
  }

  test("unsupported DML shapes are rejected whole, with guidance") {
    wh
    spark.sql("CREATE TABLE graft.dml.rej (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.dml.rej VALUES (1,'a')")
    // non-equality ON
    val e1 = intercept[Exception](spark.sql(
      """MERGE INTO graft.dml.rej t USING (SELECT 1L AS id) s
        |ON t.k > s.id WHEN MATCHED THEN DELETE""".stripMargin))
    assert(e1.getMessage.contains("MERGE ON must be"))
    // NOT MATCHED BY SOURCE
    val e2 = intercept[Exception](spark.sql(
      """MERGE INTO graft.dml.rej t USING (SELECT 1L AS id) s
        |ON t.k = s.id WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin))
    assert(e2.getMessage.contains("NOT MATCHED BY SOURCE"))
    // the rejected statements changed nothing
    assert(spark.table("graft.dml.rej").count() == 1)
  }

  test("updateWhere API: CHECK constraints gate the rewrite") {
    val root = Files.createTempDirectory("graft-dml-check").toString
    val t = DeltaLite(spark, root)
    t.append(Seq((1L, 10L), (2L, 20L)).toDF("k", "n"))
    t.addCheckConstraint("n_pos", "n > 0")
    intercept[Exception] {
      t.updateWhere(col("k") === 2L, Seq("n" -> lit(-5L)))
    }
    // nothing committed; original values intact
    assert(t.read().orderBy("k").collect().map(_.getLong(1)).toSeq ==
      Seq(10L, 20L))
    t.updateWhere(col("k") === 2L, Seq("n" -> lit(99L)))
    assert(t.read().orderBy("k").collect().map(_.getLong(1)).toSeq ==
      Seq(10L, 99L))
  }

  test("updateWhere API: works across RENAME COLUMN (logical names)") {
    val root = Files.createTempDirectory("graft-dml-ren").toString
    val t = DeltaLite(spark, root)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    t.renameColumn("v", "label")
    t.updateWhere(col("k") === 1L, Seq("label" -> lit("renamed")))
    val got = t.read().orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "renamed"), (2L, "b")))
  }
}
