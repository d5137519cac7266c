package graft

import graft.etl.DeltaLite
import graft.streaming.{DeltaSink, DeltaSourceProvider}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** DeltaLite as a streaming SOURCE: version-offset tailing, restart
  * resume from checkpoint, non-append guarding, and the table-to-table
  * loop with the exactly-once sink.
  */
class DeltaSourceSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def stream(root: String, extra: (String, String)*): DataFrame = {
    val r = spark.readStream.format(classOf[DeltaSourceProvider].getName)
      .option("path", root)
    extra.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  test("tails append commits exactly once, including appends while running") {
    import spark.implicits._
    val root = tmp("graft-src")
    val t = DeltaLite(spark, root)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    t.append(Seq((3L, "c")).toDF("k", "v"))
    val q = stream(root).writeStream.format("memory").queryName("dl_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dl_tail").select("k").collect()
        .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
      t.append(Seq((4L, "d"), (5L, "e")).toDF("k", "v"))
      q.processAllAvailable()
      assert(spark.table("dl_tail").select("k").collect()
        .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L),
        "mid-stream append must arrive exactly once")
    } finally q.stop()
  }

  test("startingVersion skips history; 'latest' tails only new commits") {
    import spark.implicits._
    val root = tmp("graft-src-sv")
    val t = DeltaLite(spark, root)
    t.append(Seq((1L, "a")).toDF("k", "v")) // v0
    t.append(Seq((2L, "b")).toDF("k", "v")) // v1
    t.append(Seq((3L, "c")).toDF("k", "v")) // v2
    // tail from v2 inclusive: history below never arrives
    val q = stream(root, "startingVersion" -> "2").writeStream
      .format("memory").queryName("dl_sv").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dl_sv").select("k").collect()
        .map(_.getLong(0)).toSeq == Seq(3L))
      t.append(Seq((4L, "d")).toDF("k", "v"))
      q.processAllAvailable()
      assert(spark.table("dl_sv").select("k").collect()
        .map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
    } finally q.stop()
    // "latest": nothing until a commit lands after stream start
    val q2 = stream(root, "startingVersion" -> "latest").writeStream
      .format("memory").queryName("dl_sv_latest").outputMode("append").start()
    try {
      q2.processAllAvailable()
      assert(spark.table("dl_sv_latest").count() == 0)
      t.append(Seq((9L, "z")).toDF("k", "v"))
      q2.processAllAvailable()
      assert(spark.table("dl_sv_latest").select("k").collect()
        .map(_.getLong(0)).toSeq == Seq(9L))
    } finally q2.stop()
  }

  test("ignoreDeletes streams past delete commits; rewrites still fail") {
    import spark.implicits._
    val root = tmp("graft-src-igd")
    val t = DeltaLite(spark, root, "k")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    t.deleteWhere(col("k") === 1) // delete-only (DV) commit
    t.append(Seq((3L, "c")).toDF("k", "v"))
    // without the option, the tail fails and NAMES the narrower opt-in
    val ck0 = tmp("graft-src-igd-ck0")
    val q0 = stream(root).writeStream.format("memory").queryName("igd0")
      .option("checkpointLocation", ck0).outputMode("append").start()
    val e = intercept[Exception] {
      try q0.processAllAvailable() finally q0.stop()
    }
    assert(e.getMessage.contains("ignoreDeletes"), e.getMessage)
    // with it, appends flow and the deleted row is simply not retracted
    val q = stream(root, "ignoreDeletes" -> "true").writeStream
      .format("memory").queryName("igd1").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("igd1").select("k").collect()
        .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
    // a rewrite (upsert) is NOT covered by ignoreDeletes
    t.upsert(Seq((2L, "B")).toDF("k", "v"), "k")
    val q2 = stream(root, "ignoreDeletes" -> "true").writeStream
      .format("memory").queryName("igd2").outputMode("append").start()
    val e2 = intercept[Exception] {
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(e2.getMessage.contains("ignoreChanges"), e2.getMessage)
  }

  test("restart from checkpoint resumes after the last delivered version") {
    import spark.implicits._
    val root = tmp("graft-src-rst")
    val ckpt = tmp("graft-src-ckpt")
    val out = tmp("graft-src-out")
    val t = DeltaLite(spark, root)
    t.append(Seq((1L, "a")).toDF("k", "v"))
    def run(): Unit = {
      val q = stream(root).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    t.append(Seq((2L, "b")).toDF("k", "v"))
    run() // second incarnation: must deliver ONLY v1's rows
    val got = spark.read.parquet(out).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L), s"restart must not replay or skip: $got")
  }

  test("non-append commits fail the tail unless ignoreChanges") {
    import spark.implicits._
    val root = tmp("graft-src-chg")
    val t = DeltaLite(spark, root)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val q = stream(root).writeStream.format("memory").queryName("dl_chg")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    t.overwrite(Seq((9L, "z")).toDF("k", "v"))
    val q2 = stream(root).writeStream.format("memory").queryName("dl_chg2")
      .outputMode("append").start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    q2.stop()
    assert(err.getMessage.contains("non-append") ||
      Option(err.getCause).exists(_.getMessage.contains("non-append")))
    // ignoreChanges streams past the overwrite (only its files delivered
    // going forward from a fresh cursor)
    val q3 = stream(root, "ignoreChanges" -> "true")
      .writeStream.format("memory").queryName("dl_chg3")
      .outputMode("append").start()
    try {
      q3.processAllAvailable()
      t.append(Seq((10L, "y")).toDF("k", "v"))
      q3.processAllAvailable()
      val ks = spark.table("dl_chg3").select("k").collect()
        .map(_.getLong(0)).toSet
      assert(ks.contains(10L), "appends after the change must flow")
    } finally q3.stop()
  }

  test("maxVersionsPerBatch drains a backlog in bounded micro-batches") {
    import spark.implicits._
    val root = tmp("graft-src-rate")
    val t = DeltaLite(spark, root)
    (1 to 5).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("k", "v")))
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    val q = stream(root, "maxVersionsPerBatch" -> "2").writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batches.synchronized {
          batches += ((id, df.select("k").collect().map(_.getLong(0)).sorted.toSeq))
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val all = batches.sortBy(_._1).flatMap(_._2).toSeq
    assert(all == (1L to 5L), s"backlog must drain completely: $all")
    assert(batches.size >= 3, s"5 commits at max 2/batch need >=3 batches: " +
      batches.map(_._2.size).mkString(","))
    assert(batches.forall(_._2.size <= 2),
      s"no batch may exceed the cap: ${batches.map(_._2.size).mkString(",")}")
  }

  test("rate limit + restart: no replays, no gaps (hwm survives the checkpoint)") {
    import spark.implicits._
    val root = tmp("graft-src-rate-rst")
    val ckpt = tmp("graft-src-rate-ckpt")
    val out = tmp("graft-src-rate-out")
    val t = DeltaLite(spark, root)
    (1 to 4).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("k", "v")))
    def run(): Unit = {
      val q = stream(root, "maxVersionsPerBatch" -> "2").writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    (5 to 7).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("k", "v")))
    run() // restart: capped getOffset must not regress below committed
    val got = spark.read.parquet(out).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == (1L to 7L),
      s"rate-limited restart must deliver exactly once, got $got")
  }

  test("table-to-table loop: source -> aggregate -> exactly-once sink") {
    import spark.implicits._
    val src = tmp("graft-loop-src")
    val dst = tmp("graft-loop-dst")
    val ckpt = tmp("graft-loop-ckpt")
    val t = DeltaLite(spark, src)
    t.append(Seq((1L, 10.0), (1L, 5.0), (2L, 7.0)).toDF("k", "x"))
    val agg = DeltaSink.aggregateWriter(DeltaLite(spark, dst), "loop-test", "k",
      b => b.groupBy(col("k")).agg(count(lit(1)).as("n")),
      Seq("n" -> ((a, b) => a + b)))
    def run(): Unit = {
      val q = stream(src).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch(agg)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    t.append(Seq((2L, 3.0), (3L, 1.0)).toDF("k", "x"))
    run()
    val got = DeltaLite(spark, dst).read().orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (2L, 2L), (3L, 1L)),
      s"incremental table-to-table aggregate drifted: $got")
  }

  test("Trigger.AvailableNow: backfill drains rate-limited batches then terminates") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val root = tmp("graft-avnow")
    val t = DeltaLite(spark, root)
    (0 until 5).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("k", "v")))
    // the scheduled-job shape: process everything that exists now in
    // bounded micro-batches (2 versions each), then STOP — no
    // always-on cluster for a nightly catch-up
    val q = stream(root, "maxVersionsPerBatch" -> "2")
      .writeStream.format("memory").queryName("avnow")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
    val got = spark.table("avnow").select("k").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 5L), s"backfill incomplete: $got")
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "rate limit must split the backfill into multiple micro-batches")
  }

  test("change feed stream: inserts and DV deletes with content, incrementally") {
    import spark.implicits._
    val root = tmp("graft-cdf")
    val t = DeltaLite(spark, root)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))      // v0
    t.append(Seq((3L, "c")).toDF("k", "v"))                 // v1
    t.deleteWhere(col("k") === 2L)                          // v2 (DV)
    val q = stream(root, "readChangeFeed" -> "true")
      .writeStream.format("memory").queryName("cdf_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      def rows() = spark.table("cdf_tail").collect()
        .map(r => (r.getLong(0), r.getString(1),
          r.getAs[String]("_change_type"), r.getAs[Int]("_commit_version")))
        .toSet
      assert(rows() == Set((1L, "a", "insert", 0), (2L, "b", "insert", 0),
        (3L, "c", "insert", 1), (2L, "b", "delete", 2)),
        s"got ${rows()}")
      // mid-stream commits: a new append and a new delete tail in with
      // their version stamps — and ONLY them
      t.append(Seq((4L, "d")).toDF("k", "v"))               // v3
      t.deleteWhere(col("k") === 1L)                        // v4
      q.processAllAvailable()
      assert(rows() == Set((1L, "a", "insert", 0), (2L, "b", "insert", 0),
        (3L, "c", "insert", 1), (2L, "b", "delete", 2),
        (4L, "d", "insert", 3), (1L, "a", "delete", 4)),
        s"got ${rows()}")
    } finally q.stop()
  }

  test("CDF replication: mirror tracks source state including deletes, replay-safe") {
    import spark.implicits._
    val src = tmp("graft-cdf-src")
    val dst = tmp("graft-cdf-dst")
    val ckpt = tmp("graft-cdf-ck")
    val t = DeltaLite(spark, src)
    val mirror = DeltaLite(spark, dst, statsKey = "k")
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")) // v0
    t.deleteWhere(col("k") === 2L)                                // v1
    def sync(): Unit = {
      val q = stream(src, "readChangeFeed" -> "true")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch(DeltaSink.cdfApplyWriter(mirror, "cdf-app", "k"))
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def state(dl: DeltaLite) = dl.read().collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    sync()
    assert(state(mirror) == Map(1L -> "a", 3L -> "c"),
      s"mirror after bootstrap: ${state(mirror)}")
    // source evolves: update-by-reinsert, fresh insert, another delete
    t.deleteWhere(col("k") === 3L)                                // v2
    t.append(Seq((3L, "c2"), (4L, "d")).toDF("k", "v"))           // v3
    sync()
    assert(state(mirror) == state(t), s"mirror drifted: ${state(mirror)} " +
      s"vs ${state(t)}")
    // replaying an applied batch must be a no-op
    val before = mirror.latestVersion
    DeltaSink.cdfApplyWriter(mirror, "cdf-app", "k")(
      t.changesBetween(-1, t.latestVersion.get), 0L)
    assert(mirror.latestVersion == before, "replayed batch re-applied")
  }

  test("change feed stream: marked compaction flows strictly; un-gated rewrites fail unless ignoreChanges") {
    import spark.implicits._
    val root = tmp("graft-cdf-rw")
    val t = DeltaLite(spark, root)
    t.append(Seq((1L, "a")).toDF("k", "v").coalesce(1))
    t.append(Seq((2L, "b")).toDF("k", "v").coalesce(1))
    t.compact(targetBytes = 1 << 20, minFiles = 2) // rewrite commit
    // compaction commits carry the explicit row-preserving marker, so
    // even a STRICT feed streams past them — no ignoreChanges needed
    val strict = stream(root, "readChangeFeed" -> "true")
      .writeStream.format("memory").queryName("cdf_strict")
      .outputMode("append").start()
    try {
      strict.processAllAvailable()
      val got = spark.table("cdf_strict").collect()
        .map(r => (r.getLong(0), r.getAs[String]("_change_type"))).toSet
      assert(got == Set((1L, "insert"), (2L, "insert")),
        s"compaction must be invisible to the strict feed: $got")
    } finally strict.stop()
    // an UN-GATED row-changing rewrite (upsert without the
    // enableChangeDataFeed property) still fails a strict feed…
    t.upsert(Seq((1L, "A")).toDF("k", "v"), "k")
    val strict2 = stream(root, "readChangeFeed" -> "true")
      .writeStream.format("memory").queryName("cdf_strict2")
      .outputMode("append").start()
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try strict2.processAllAvailable() finally strict2.stop()
    }
    assert(failed.getMessage.contains("change feed") ||
      Option(failed.getCause).exists(_.getMessage.contains("change feed")))
    // …and ignoreChanges skips it (rewritten rows not retracted)
    val lax = stream(root, "readChangeFeed" -> "true",
        "ignoreChanges" -> "true")
      .writeStream.format("memory").queryName("cdf_lax")
      .outputMode("append").start()
    try {
      lax.processAllAvailable()
      val got = spark.table("cdf_lax").collect()
        .map(r => (r.getLong(0), r.getAs[String]("_change_type"))).toSet
      assert(got == Set((1L, "insert"), (2L, "insert")),
        s"un-gated rewrite must be skipped by the lax feed: $got")
    } finally lax.stop()
  }

  test("change feed stream serves merge pre/post images when CDF is enabled") {
    import spark.implicits._
    val root = tmp("graft-cdf-gated")
    val t = DeltaLite(spark, root)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    t.setTableProperties(Map("enableChangeDataFeed" -> "true"))
    t.upsert(Seq((1L, "A"), (3L, "c")).toDF("k", "v"), "k")
    val q = stream(root, "readChangeFeed" -> "true")
      .writeStream.format("memory").queryName("cdf_gated")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cdf_gated").collect()
        .map(r => (r.getLong(0), r.getString(1),
          r.getAs[String]("_change_type"))).toSet
      assert(got == Set(
        (1L, "a", "insert"), (2L, "b", "insert"),
        (1L, "a", "update_preimage"), (1L, "A", "update_postimage"),
        (3L, "c", "insert")), s"got $got")
    } finally q.stop()
  }

  test("readStream.table: named catalog tables stream without the path incantation") {
    graft.catalog.GraftCatalog.install(spark,
      Files.createTempDirectory("graft-rst-wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.gold")
    spark.sql("CREATE TABLE graft.gold.s (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.gold.s VALUES (1, 'a'), (2, 'b')")
    val ckpt = tmp("graft-rst-ck")
    val out = tmp("graft-rst-out")
    // a durable sink (parquet), so the same checkpoint can be resumed
    // across incarnations (memory sinks cannot recover)
    def run(): Unit = {
      val q = spark.readStream.table("graft.gold.s")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // restart from the same checkpoint: resumes after the delivered
    // versions — appends land exactly once across the restart
    spark.sql("INSERT INTO graft.gold.s VALUES (3, 'c')")
    run()
    assert(spark.read.parquet(out).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L),
      "restart must resume exactly after the last delivered version")
  }

  test("readStream.table with readChangeFeed: CDF columns resolve by name") {
    graft.catalog.GraftCatalog.install(spark,
      Files.createTempDirectory("graft-rstc-wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.gold2")
    spark.sql("CREATE TABLE graft.gold2.c (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.gold2.c VALUES (1, 'a')")
    val q = spark.readStream.option("readChangeFeed", "true")
      .table("graft.gold2.c")
      .select(col("k"), col("v"), col("_change_type"), col("_commit_version"))
      .writeStream.format("memory").queryName("rstc_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.sql("DELETE FROM graft.gold2.c WHERE k = 1")
      q.processAllAvailable()
      val got = spark.table("rstc_tail").collect()
        .map(r => (r.getLong(0), r.getString(1),
          r.getAs[String]("_change_type"))).toSet
      assert(got == Set((1L, "a", "insert"), (1L, "a", "delete")),
        s"got $got")
    } finally q.stop()
  }

}
