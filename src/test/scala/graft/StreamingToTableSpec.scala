package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** `df.writeStream.toTable("graft.db.t")`: the DSv2 streaming write —
  * per-task parquet writers, one txn-stamped commit per epoch,
  * exactly-once across restarts, Complete mode as overwrite commits,
  * CHECK constraints enforced before publication.
  */
class StreamingToTableSpec extends SparkSpec {
  import spark.implicits._

  private def wh(): Unit = {
    graft.catalog.GraftCatalog.install(spark,
      Files.createTempDirectory("graft-stt-wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stt")
  }

  test("appends land exactly once, incrementally, across epochs") {
    wh()
    spark.sql("CREATE TABLE graft.stt.t (k BIGINT, v STRING)")
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val ckpt = Files.createTempDirectory("graft-stt-ck").toString
    val q = in.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", ckpt)
      .toTable("graft.stt.t")
    try {
      in.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(spark.table("graft.stt.t").count() == 2)
      in.addData((3L, "c"))
      q.processAllAvailable()
      val got = spark.sql("SELECT k, v FROM graft.stt.t ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")), s"got $got")
    } finally q.stop()
    // restart on the same checkpoint: no replays, no gaps
    val q2 = in.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", ckpt)
      .toTable("graft.stt.t")
    try {
      in.addData((4L, "d"))
      q2.processAllAvailable()
      assert(spark.sql("SELECT k FROM graft.stt.t ORDER BY k").collect()
        .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L),
        "restart must not replay or skip epochs")
    } finally q2.stop()
    // the epochs are real versioned commits: time travel works
    val loc = spark.sql("SHOW TBLPROPERTIES graft.stt.t").collect()
      .find(_.getString(0) == "graft.location").get.getString(1)
    val t = graft.etl.DeltaLite(spark, loc)
    assert(t.readAsOf(t.latestVersion.get - 1).count() == 3)
  }

  test("a replayed epoch is skipped and its duplicate files are dropped") {
    wh()
    spark.sql("CREATE TABLE graft.stt.r (k BIGINT)")
    val loc = spark.sql("SHOW TBLPROPERTIES graft.stt.r").collect()
      .find(_.getString(0) == "graft.location").get.getString(1)
    val t = graft.etl.DeltaLite(spark, loc)
    // simulate the sink: same (app, epoch) published twice
    val dir = new java.io.File(loc, "v=s0-manual"); dir.mkdirs()
    Seq(1L, 2L).toDF("k").coalesce(1).write.mode("overwrite")
      .parquet(dir.toString + "/x")
    val part = new java.io.File(dir, "x").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val v1 = t.adoptStreamEpoch(Seq((part.toString, part.length())),
      overwrite = false, "graft-stream-q1", 0L)
    assert(v1.isDefined)
    assert(t.adoptStreamEpoch(Seq((part.toString, part.length())),
      overwrite = false, "graft-stream-q1", 0L).isEmpty,
      "replayed epoch must be skipped")
    assert(t.read().count() == 2)
  }

  test("Complete mode publishes overwrite commits") {
    wh()
    spark.sql("CREATE TABLE graft.stt.agg (v STRING, n BIGINT)")
    implicit val sq = spark.sqlContext
    val in = MemoryStream[String]
    val q = in.toDF().toDF("v").groupBy($"v").agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-stt-cck").toString)
      .toTable("graft.stt.agg")
    try {
      in.addData("a", "a", "b")
      q.processAllAvailable()
      in.addData("a")
      q.processAllAvailable()
      val got = spark.sql("SELECT v, n FROM graft.stt.agg ORDER BY v")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == Seq(("a", 3L), ("b", 1L)),
        s"complete mode must replace the snapshot: $got")
    } finally q.stop()
  }

  test("CHECK constraints gate the epoch; partitioned tables rejected loudly") {
    wh()
    spark.sql("CREATE TABLE graft.stt.c (k BIGINT)")
    val loc = spark.sql("SHOW TBLPROPERTIES graft.stt.c").collect()
      .find(_.getString(0) == "graft.location").get.getString(1)
    val t = graft.etl.DeltaLite(spark, loc)
    t.addCheckConstraint("k_pos", "k > 0")
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Long]
    val q = in.toDF().toDF("k").writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-stt-chk").toString)
      .toTable("graft.stt.c")
    try {
      in.addData(-5L)
      intercept[Exception](q.processAllAvailable())
    } finally q.stop()
    assert(spark.table("graft.stt.c").count() == 0,
      "a constraint-violating epoch must publish NOTHING")
    // partitioned tables are rejected before any writer runs
    spark.sql("CREATE TABLE graft.stt.p (k BIGINT, d STRING) PARTITIONED BY (d)")
    val in2 = MemoryStream[(Long, String)]
    val e = intercept[Exception] {
      val qp = in2.toDF().toDF("k", "d").writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("graft-stt-pck").toString)
        .toTable("graft.stt.p")
      try { in2.addData((1L, "x")); qp.processAllAvailable() }
      finally qp.stop()
    }
    assert(e.getMessage != null)
  }
}
