package graft

import java.nio.file.Files

/** SQL `MERGE WITH SCHEMA EVOLUTION`: the analyzer expands star
  * clauses against the current target schema, so the conversion rule
  * re-extends them with the new source columns and the command widens
  * the table (metadata-only) before the merge runs.
  */
class MergeSchemaEvolutionSqlSpec extends SparkSpec {

  test("SQL MERGE WITH SCHEMA EVOLUTION widens and writes new columns") {
    graft.catalog.GraftCatalog.install(spark,
      Files.createTempDirectory("graft-evo-wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.evo")
    spark.sql("CREATE TABLE graft.evo.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.evo.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO graft.evo.t t
        |USING (SELECT 1L AS k, 'A' AS v, 'x' AS extra
        |       UNION ALL SELECT 3L, 'c', 'y') s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.sql("SELECT k, v, extra FROM graft.evo.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).toSeq
    assert(got == Seq(
      (1L, "A", Some("x")),  // star update carries the evolved column
      (2L, "b", None),       // untouched rows read the new column null
      (3L, "c", Some("y")))) // star insert carries it
    // schema evolved once; a second evolution-free merge still works
    assert(spark.table("graft.evo.t").schema.fieldNames.toSeq
      == Seq("k", "v", "extra"))
    spark.sql(
      """MERGE INTO graft.evo.t t
        |USING (SELECT 2L AS k, 'B' AS v, 'z' AS extra) s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(spark.sql("SELECT extra FROM graft.evo.t WHERE k = 2")
      .head().getString(0) == "z")
  }

  test("without WITH SCHEMA EVOLUTION, extra source columns stay clause-only") {
    graft.catalog.GraftCatalog.install(spark,
      Files.createTempDirectory("graft-evo-wh2").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.evo2")
    spark.sql("CREATE TABLE graft.evo2.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.evo2.t VALUES (1, 'a')")
    spark.sql(
      """MERGE INTO graft.evo2.t t
        |USING (SELECT 1L AS k, 'A' AS v, 'x' AS extra) s
        |ON t.k = s.k
        |WHEN MATCHED AND s.extra = 'x' THEN UPDATE SET *""".stripMargin)
    // the clause condition saw s.extra, but the schema did not evolve
    assert(spark.table("graft.evo2.t").schema.fieldNames.toSeq
      == Seq("k", "v"))
    assert(spark.sql("SELECT v FROM graft.evo2.t").head().getString(0) == "A")
  }

  test("explicit partial INSERT list does not trigger evolution (Delta parity)") {
    graft.catalog.GraftCatalog.install(spark,
      Files.createTempDirectory("graft-evo-wh3").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.evo3")
    spark.sql("CREATE TABLE graft.evo3.t (k BIGINT, v STRING, n BIGINT)")
    spark.sql("INSERT INTO graft.evo3.t VALUES (1, 'a', 10)")
    // WITH SCHEMA EVOLUTION but the only writable clause is an
    // EXPLICIT partial insert list: Delta evolves only through star
    // clauses, so the table must NOT widen and the absent column (n)
    // stays NULL on the inserted row
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO graft.evo3.t t
        |USING (SELECT 2L AS k, 'b' AS v, 'x' AS extra) s
        |ON t.k = s.k
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    assert(spark.table("graft.evo3.t").schema.fieldNames.toSeq
      == Seq("k", "v", "n"),
      "explicit insert list must not evolve the schema")
    val got = spark.sql("SELECT k, v, n FROM graft.evo3.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(got == Seq((1L, "a", Some(10L)), (2L, "b", None)))
  }
}
