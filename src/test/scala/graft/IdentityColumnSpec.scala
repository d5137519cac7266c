package graft

import graft.etl.DeltaLite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** IDENTITY columns: commit-log-allocated monotonic ids — the
  * declaration rides Spark's column metadata in the table schema, the
  * per-column high-water mark rides the table properties of the SAME
  * commit as the data (atomic allocation), and RESTORE reverts the
  * mark with its snapshot.
  */
class IdentityColumnSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def identityField(name: String, start: Long = 1L, step: Long = 1L,
      allowExplicit: Boolean = false): StructField =
    StructField(name, LongType, nullable = false,
      new MetadataBuilder()
        .putLong("identity.start", start)
        .putLong("identity.step", step)
        .putBoolean("identity.allowExplicitInsert", allowExplicit)
        .build())

  test("ids allocate dense per batch, unique and monotone across batches") {
    val root = tmp("graft-ident")
    val t = new DeltaLite(spark, root)
    val sch = StructType(Seq(identityField("id"),
      StructField("v", StringType)))
    t.append(spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), sch))
    t.append(Seq("a", "b", "c").toDF("v"))
    t.append(Seq("d", "e").toDF("v"))
    val got = t.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")),
      s"got $got")
    // the mark rides table properties, atomic with the data commit
    assert(t.tableProperties("graft.identity.id.next") == "6")
  }

  test("start/step honored; GENERATED ALWAYS rejects explicit values") {
    val root = tmp("graft-ident-ss")
    val t = new DeltaLite(spark, root)
    val sch = StructType(Seq(identityField("id", start = 100L, step = 10L),
      StructField("v", StringType)))
    t.append(spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), sch))
    t.append(Seq("a", "b").toDF("v"))
    assert(t.read().orderBy("id").collect().map(_.getLong(0)).toSeq
      == Seq(100L, 110L))
    val e = intercept[IllegalArgumentException](
      t.append(Seq((999L, "x")).toDF("id", "v")))
    assert(e.getMessage.contains("GENERATED ALWAYS"), e.getMessage)
    // nothing committed by the rejected batch
    assert(t.read().count() == 2)
  }

  test("BY DEFAULT accepts explicit values and advances the mark past them") {
    val root = tmp("graft-ident-bd")
    val t = new DeltaLite(spark, root)
    val sch = StructType(Seq(identityField("id", allowExplicit = true),
      StructField("v", StringType)))
    t.append(spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), sch))
    t.append(Seq((50L, "x")).toDF("id", "v")) // explicit
    t.append(Seq("y").toDF("v")) // generated: must jump past 50
    val got = t.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((50L, "x"), (51L, "y")), s"got $got")
  }

  test("RESTORE reverts the high-water mark with the snapshot") {
    val root = tmp("graft-ident-rs")
    val t = new DeltaLite(spark, root)
    val sch = StructType(Seq(identityField("id"), StructField("v", StringType)))
    t.append(spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), sch))
    t.append(Seq("a").toDF("v"))
    val vA = t.latestVersion.get
    t.append(Seq("b").toDF("v")) // id 2
    t.restore(vA)
    // the mark restored with the snapshot: id 2 is re-issued (the
    // documented RESTORE caveat, same as Delta's)
    t.append(Seq("c").toDF("v"))
    val got = t.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "c")), s"got $got")
  }

  test("racing identity appends never double-allocate") {
    val root = tmp("graft-ident-race")
    val t = new DeltaLite(spark, root)
    val sch = StructType(Seq(identityField("id"), StructField("v", StringType)))
    t.append(spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), sch))
    // two handles over the same root, appending concurrently: identity
    // appends are snapshot-dependent (never auto-retry), so at most
    // one of a racing pair lands — and ids can never collide
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    val outcomes = (0 until 2).map { i =>
      pool.submit(new java.util.concurrent.Callable[Option[String]] {
        override def call(): Option[String] = {
          val h = DeltaLite(spark, root)
          gate.await()
          try { h.append(Seq(s"w$i").toDF("v")); None }
          catch { case e: Exception => Some(e.getClass.getSimpleName) }
        }
      })
    }
    gate.countDown()
    val results = outcomes.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    val ids = t.read().select("id").collect().map(_.getLong(0)).toSeq
    assert(ids.distinct.size == ids.size, s"duplicate identity ids: $ids")
    assert(t.read().count() == results.count(_.isEmpty),
      "every successful append landed exactly once")
  }

  test("SQL surface: CREATE TABLE with GENERATED ALWAYS AS IDENTITY") {
    graft.catalog.GraftCatalog.install(spark,
      Files.createTempDirectory("graft-ident-wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ident")
    spark.sql("CREATE TABLE graft.ident.t (" +
      "id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)")
    spark.sql("INSERT INTO graft.ident.t (v) VALUES ('a'), ('b')")
    spark.sql("INSERT INTO graft.ident.t (v) VALUES ('c')")
    val got = spark.sql("SELECT id, v FROM graft.ident.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got.map(_._2) == Seq("a", "b", "c"))
    assert(got.map(_._1).distinct.size == 3, s"ids must be unique: $got")
    assert(got.map(_._1) == got.map(_._1).sorted, "ids monotone")
    // custom start/step through SQL
    spark.sql("CREATE TABLE graft.ident.s (" +
      "id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 5 INCREMENT BY 5), " +
      "v STRING)")
    spark.sql("INSERT INTO graft.ident.s (v) VALUES ('x'), ('y')")
    assert(spark.sql("SELECT id FROM graft.ident.s ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(5L, 10L))
  }
}
