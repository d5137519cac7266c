package graft

import graft.etl.DeltaLite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** GENERATED ALWAYS AS (expr) columns: the expression rides the
  * schema's `GENERATION_EXPRESSION` metadata, appends compute absent
  * values (and verify explicit ones), updates and merges RECOMPUTE the
  * column from post-assignment values, and SET on a generated column
  * is rejected — the expression is the single source of truth.
  */
class GeneratedColumnSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def genField(name: String, dt: DataType, exprSql: String): StructField =
    StructField(name, dt, nullable = true,
      new MetadataBuilder()
        .putString(DeltaLite.GenerationExpressionKey, exprSql).build())

  private def seed(root: String): DeltaLite = {
    val t = new DeltaLite(spark, root, statsKey = Some("k"))
    val sch = StructType(Seq(
      StructField("k", LongType), StructField("amt", DoubleType),
      genField("amt2", DoubleType, "amt * 2")))
    t.append(spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), sch))
    t
  }

  test("append computes absent values; explicit mismatches fail loudly") {
    val t = seed(tmp("graft-gen"))
    t.append(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "amt"))
    val got = t.read().orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 10.0, 20.0), (2L, 20.0, 40.0)), s"got $got")
    // explicit matching values pass (a re-append of exported data)
    t.append(Seq((3L, 5.0, 10.0)).toDF("k", "amt", "amt2"))
    assert(t.read().count() == 3)
    // explicit MISMATCHED values fail loudly, nothing commits
    val e = intercept[IllegalArgumentException](
      t.append(Seq((4L, 5.0, 999.0)).toDF("k", "amt", "amt2")))
    assert(e.getMessage.contains("generated column"), e.getMessage)
    assert(t.read().count() == 3)
  }

  test("updateWhere recomputes; SET on the generated column is rejected") {
    val t = seed(tmp("graft-gen-upd"))
    t.append(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "amt"))
    t.updateWhere(col("k") === 1L, Seq("amt" -> lit(100.0)))
    val got = t.read().orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 100.0, 200.0), (2L, 20.0, 40.0)),
      s"update must recompute the generated column: $got")
    val e = intercept[IllegalArgumentException](
      t.updateWhere(col("k") === 1L, Seq("amt2" -> lit(7.0))))
    assert(e.getMessage.contains("generated"), e.getMessage)
  }

  test("merge recomputes on update and insert; source needn't carry the column") {
    val t = seed(tmp("graft-gen-merge"))
    t.append(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "amt"))
    // star-form merge with a source that LACKS the generated column
    t.merge(Seq((1L, 11.0), (9L, 90.0)).toDF("k", "amt"), "k")
    val got = t.read().orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 11.0, 22.0), (2L, 20.0, 40.0), (9L, 90.0, 180.0)),
      s"merge must recompute generated values: $got")
  }

  test("SQL surface: CREATE TABLE with GENERATED ALWAYS AS, INSERT + UPDATE") {
    graft.catalog.GraftCatalog.install(spark,
      Files.createTempDirectory("graft-gen-wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.gen")
    spark.sql("CREATE TABLE graft.gen.t (" +
      "k BIGINT, amt DOUBLE, amt2 DOUBLE GENERATED ALWAYS AS (amt * 2))")
    spark.sql("INSERT INTO graft.gen.t (k, amt) VALUES (1, 10.0), (2, 20.0)")
    val got = spark.sql("SELECT k, amt, amt2 FROM graft.gen.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 10.0, 20.0), (2L, 20.0, 40.0)), s"got $got")
    spark.sql("UPDATE graft.gen.t SET amt = 100.0 WHERE k = 1")
    assert(spark.sql("SELECT amt2 FROM graft.gen.t WHERE k = 1")
      .head().getDouble(0) == 200.0,
      "SQL UPDATE must recompute the generated column")
    // a date-partition generated column — the classic use
    spark.sql("CREATE TABLE graft.gen.ev (" +
      "ts TIMESTAMP, d DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))")
    spark.sql("INSERT INTO graft.gen.ev (ts) VALUES " +
      "(TIMESTAMP'2026-01-02 03:04:05')")
    assert(spark.sql("SELECT CAST(d AS STRING) FROM graft.gen.ev")
      .head().getString(0) == "2026-01-02")
    // chained generated columns are rejected at CREATE
    val e = intercept[Exception](spark.sql("CREATE TABLE graft.gen.bad (" +
      "a DOUBLE, b DOUBLE GENERATED ALWAYS AS (a * 2), " +
      "c DOUBLE GENERATED ALWAYS AS (b * 2))"))
    assert(e.getMessage.contains("another"), e.getMessage)
  }
}
