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
    // two WHEN MATCHED UPDATE clauses
    val e2 = intercept[Exception](spark.sql(
      """MERGE INTO graft.dml.rej t USING (SELECT 1L AS id, 'x' AS w) s
        |ON t.k = s.id
        |WHEN MATCHED AND s.w = 'x' THEN UPDATE SET v = s.w
        |WHEN MATCHED THEN UPDATE SET v = 'y'""".stripMargin))
    assert(e2.getMessage.contains("at most one WHEN MATCHED UPDATE"))
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

  test("MERGE ON composite key: conjunction of equalities") {
    wh
    spark.sql("CREATE TABLE graft.dml.ck (d STRING, id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.dml.ck VALUES " +
      "('2024-01-01', 1, 'a'), ('2024-01-01', 2, 'b'), ('2024-01-02', 1, 'c')")
    spark.sql(
      """MERGE INTO graft.dml.ck t
        |USING (SELECT '2024-01-01' AS d, 1L AS id, 'A' AS v
        |       UNION ALL
        |       SELECT '2024-01-03', 1L, 'e') s
        |ON t.d = s.d AND t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (d, id, v) VALUES (s.d, s.id, s.v)
        |""".stripMargin)
    val got = spark.sql("SELECT d, id, v FROM graft.dml.ck ORDER BY d, id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq(
      ("2024-01-01", 1L, "A"), ("2024-01-01", 2L, "b"),
      ("2024-01-02", 1L, "c"), ("2024-01-03", 1L, "e")))
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: mirror sync through SQL") {
    wh
    spark.sql("CREATE TABLE graft.dml.ms (k BIGINT, v STRING, stale BOOLEAN)")
    spark.sql("INSERT INTO graft.dml.ms VALUES " +
      "(1,'a',false), (2,'b',false), (3,'c',false)")
    spark.sql(
      """MERGE INTO graft.dml.ms t
        |USING (SELECT 1L AS k, 'A' AS v UNION ALL SELECT 9L, 'i') s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v, stale) VALUES (s.k, s.v, false)
        |WHEN NOT MATCHED BY SOURCE AND t.k = 2 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET stale = true
        |""".stripMargin)
    val got = spark.sql("SELECT k, v, stale FROM graft.dml.ms ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSeq
    assert(got == Seq((1L, "A", false), (3L, "c", true), (9L, "i", false)))
  }

  test("MERGE clauses fire in statement order: update-first suppresses the delete") {
    wh
    spark.sql("CREATE TABLE graft.dml.ord (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.dml.ord VALUES (1,'a'), (2,'b'), (3,'c')")
    // the UPDATE clause precedes the DELETE clause and k=2 satisfies
    // BOTH conditions — SQL semantics: the first clause whose
    // condition holds wins, so k=2 updates, nothing deletes (Spark's
    // parser already forces a condition on every non-last clause, so
    // the unconditional-first shape cannot even parse)
    spark.sql(
      """MERGE INTO graft.dml.ord t
        |USING (SELECT 1L AS k UNION ALL SELECT 2L) s
        |ON t.k = s.k
        |WHEN MATCHED AND t.k <= 2 THEN UPDATE SET v = 'u'
        |WHEN MATCHED THEN DELETE
        |""".stripMargin)
    val got = spark.sql("SELECT k, v FROM graft.dml.ord ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "u"), (2L, "u"), (3L, "c")),
      s"update-first statement order must suppress the delete: $got")
    // delete-first still deletes (both conditional)
    spark.sql(
      """MERGE INTO graft.dml.ord t
        |USING (SELECT 1L AS k UNION ALL SELECT 2L) s
        |ON t.k = s.k
        |WHEN MATCHED AND t.k = 2 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = 'w'
        |""".stripMargin)
    val got2 = spark.sql("SELECT k, v FROM graft.dml.ord ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got2 == Seq((1L, "w"), (3L, "c")), s"delete-first: $got2")
  }

  test("BY SOURCE clauses fire in statement order too") {
    wh
    spark.sql("CREATE TABLE graft.dml.ord2 (k BIGINT, v STRING, stale BOOLEAN)")
    spark.sql("INSERT INTO graft.dml.ord2 VALUES " +
      "(1,'a',false), (2,'b',false), (3,'c',false)")
    // the BY SOURCE UPDATE precedes the DELETE and both conditions
    // hold for every unmatched row — statement order: the UPDATE wins,
    // the later DELETE is dead for those rows
    spark.sql(
      """MERGE INTO graft.dml.ord2 t
        |USING (SELECT 1L AS k, 'A' AS v) s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED BY SOURCE AND t.k >= 2 THEN UPDATE SET stale = true
        |WHEN NOT MATCHED BY SOURCE THEN DELETE
        |""".stripMargin)
    val got = spark.sql("SELECT k, v, stale FROM graft.dml.ord2 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSeq
    assert(got == Seq((1L, "A", false), (2L, "b", true), (3L, "c", true)),
      s"unconditional BY SOURCE UPDATE first must win over DELETE: $got")
  }

  test("UPDATE SET on a nested struct field rebuilds the struct") {
    wh
    spark.sql("CREATE TABLE graft.dml.ns " +
      "(k BIGINT, info STRUCT<title: STRING, views: BIGINT>)")
    spark.sql("INSERT INTO graft.dml.ns VALUES " +
      "(1, named_struct('title','t1','views',10L)), " +
      "(2, named_struct('title','t2','views',20L))")
    spark.sql("UPDATE graft.dml.ns SET info.views = info.views + 5 WHERE k = 1")
    val got = spark.sql(
      "SELECT k, info.title, info.views FROM graft.dml.ns ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "t1", 15L), (2L, "t2", 20L)))
  }

  test("MERGE UPDATE SET nested field through the matched clause") {
    wh
    spark.sql("CREATE TABLE graft.dml.nm " +
      "(k BIGINT, info STRUCT<title: STRING, views: BIGINT>)")
    spark.sql("INSERT INTO graft.dml.nm VALUES " +
      "(1, named_struct('title','t1','views',10L))")
    spark.sql(
      """MERGE INTO graft.dml.nm t USING (SELECT 1L AS k, 99L AS nv) s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET info.views = s.nv
        |""".stripMargin)
    val got = spark.sql("SELECT info.title, info.views FROM graft.dml.nm")
      .head()
    assert((got.getString(0), got.getLong(1)) == ("t1", 99L))
  }

  test("ALTER COLUMN type widening: metadata-only, time travel keeps narrow") {
    wh
    spark.sql("CREATE TABLE graft.dml.wd (k INT, amt DECIMAL(5,2))")
    spark.sql("INSERT INTO graft.dml.wd VALUES (1, 1.50), (2, 2.25)")
    val t = new DeltaLite(spark, tablePath("graft.dml.wd"))
    val before = t.liveFiles().toSet
    val vNarrow = t.latestVersion.get
    spark.sql("ALTER TABLE graft.dml.wd ALTER COLUMN k TYPE BIGINT")
    spark.sql("ALTER TABLE graft.dml.wd ALTER COLUMN amt TYPE DECIMAL(12,2)")
    // zero data movement
    assert(new DeltaLite(spark, tablePath("graft.dml.wd")).liveFiles().toSet
      == before, "widen must not rewrite any data file")
    // reads serve the wide type; narrow files widen in the reader
    val df = spark.table("graft.dml.wd")
    assert(df.schema("k").dataType.simpleString == "bigint")
    assert(df.schema("amt").dataType.simpleString == "decimal(12,2)")
    assert(df.orderBy("k").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // new wide-shape inserts land next to narrow files
    spark.sql("INSERT INTO graft.dml.wd VALUES (3000000000, 123.45)")
    assert(spark.sql("SELECT sum(k) FROM graft.dml.wd").head().getLong(0)
      == 3000000003L)
    // time travel below the widen keeps the narrow schema
    assert(spark.sql(
      s"SELECT * FROM graft.dml.wd VERSION AS OF $vNarrow")
      .schema("k").dataType.simpleString == "int")
    // lossy narrowing is rejected by Spark's analyzer itself
    intercept[Exception](spark.sql(
      "ALTER TABLE graft.dml.wd ALTER COLUMN amt TYPE DECIMAL(5,1)"))
    // an upcast Spark allows but the parquet reader can't widen in
    // place (int→double) hits OUR metadata-only guard
    spark.sql("CREATE TABLE graft.dml.wd2 (n INT)")
    spark.sql("INSERT INTO graft.dml.wd2 VALUES (7)")
    val ex = intercept[Exception](spark.sql(
      "ALTER TABLE graft.dml.wd2 ALTER COLUMN n TYPE DOUBLE"))
    assert(ex.getMessage.contains("lossless"))
  }
}
