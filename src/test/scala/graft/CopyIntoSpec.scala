package graft

import graft.etl._
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** COPY INTO: idempotent incremental file ingestion — delta-only
  * loads, ledger independence from the table's file lifecycle, ledger
  * survival through checkpoint + cleanLog, schema enforcement, and
  * the SQL CALL surface.
  */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def writeBatch(dir: String, name: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("k", "v").coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/$name")

  test("loads only new files; nothing-new is a no-op without a commit") {
    val src = tmp("graft-copy-src")
    writeBatch(src, "b1", Seq((1L, "a"), (2L, "b")))
    writeBatch(src, "b2", Seq((3L, "c")))
    val t = DeltaLite(spark, tmp("graft-copy-tbl"))
    val v1 = t.copyInto(src)
    assert(v1.isDefined)
    assert(t.read().count() == 3)
    // nothing new → no commit
    assert(t.copyInto(src).isEmpty)
    assert(t.latestVersion == v1)
    // a new batch arrives → only its rows load
    writeBatch(src, "b3", Seq((4L, "d"), (5L, "e")))
    val v2 = t.copyInto(src)
    assert(v2.exists(_ > v1.get))
    assert(t.read().count() == 5)
    assert(t.read().orderBy("k").select("k").as[Long].collect().toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("ledger is independent of the table's own file lifecycle") {
    val src = tmp("graft-copy-src2")
    writeBatch(src, "b1", Seq((1L, "a"), (2L, "b")))
    val t = DeltaLite(spark, tmp("graft-copy-tbl2"))
    t.copyInto(src)
    // compact rewrites the table's files; delete removes rows — the
    // SOURCE ledger must be unaffected (no re-ingestion)
    t.append(Seq((10L, "x")).toDF("k", "v"))
    t.compact()
    t.deleteWhere(col("k") === 1L)
    assert(t.copyInto(src).isEmpty, "rewritten table files must not re-ingest")
    assert(t.read().orderBy("k").select("k").as[Long].collect().toSeq ==
      Seq(2L, 10L))
  }

  test("ledger survives checkpoint + cleanLog (fresh handle)") {
    val src = tmp("graft-copy-src3")
    writeBatch(src, "b1", Seq((1L, "a")))
    val root = tmp("graft-copy-tbl3")
    val t = DeltaLite(spark, root)
    t.copyInto(src)
    (0 until 3).foreach(i => t.append(Seq((100L + i, "x")).toDF("k", "v")))
    t.checkpointNow()
    t.cleanLog()
    val reopened = DeltaLite(spark, root)
    assert(reopened.ingestedFiles().nonEmpty,
      "ledger must ride the checkpoint")
    assert(reopened.copyInto(src).isEmpty,
      "a post-cleanLog replay must not re-ingest")
  }

  test("schema mismatch is rejected before anything commits") {
    val src = tmp("graft-copy-src4")
    Seq((1L, 2.5)).toDF("k", "wrong").coalesce(1)
      .write.parquet(s"$src/b1")
    val t = DeltaLite(spark, tmp("graft-copy-tbl4"))
    t.append(Seq((1L, "a")).toDF("k", "v"))
    val v = t.latestVersion
    intercept[Exception](t.copyInto(src))
    assert(t.latestVersion == v)
  }

  test("CALL graft.system.copy_into drives the same path from SQL") {
    val wh = tmp("graft-copy-wh")
    graft.catalog.GraftCatalog.install(spark, wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ing")
    spark.sql("CREATE TABLE graft.ing.t (k BIGINT, v STRING)")
    val src = tmp("graft-copy-src5")
    writeBatch(src, "b1", Seq((7L, "z")))
    val r1 = spark.sql(s"CALL graft.system.copy_into('ing.t', '$src')")
      .collect().head.getString(0)
    assert(r1.startsWith("ingested at v"))
    val r2 = spark.sql(s"CALL graft.system.copy_into('ing.t', '$src')")
      .collect().head.getString(0)
    assert(r2 == "noop")
    assert(spark.table("graft.ing.t").count() == 1)
  }
}
