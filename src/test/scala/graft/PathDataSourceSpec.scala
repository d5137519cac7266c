package graft

import graft.etl.DeltaLite
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The path-based `format("delta-lite")` surface — the incantation a
  * migrating Delta user types for tables that live at a path, not in
  * a catalog: batch read/write via the DSv2 TableProvider (reads
  * substitute to the same skipping-index scan as catalog tables),
  * V1 streaming reads unchanged under the same short name.
  */
class PathDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-pathds").toString + "/t"

  test("first append CREATES the table; load() reads it back") {
    val root = tmp()
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format("delta-lite").mode("append").save(root)
    Seq((3L, "c")).toDF("k", "v")
      .write.format("delta-lite").mode("append").save(root)
    val got = spark.read.format("delta-lite").load(root)
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // two append commits — the write went through real versioned commits
    assert(DeltaLite(spark, root).latestVersion.contains(1))
  }

  test("mode overwrite replaces; versionAsOf reads the old snapshot") {
    val root = tmp()
    Seq((1L, "a")).toDF("k", "v")
      .write.format("delta-lite").mode("append").save(root)
    Seq((9L, "z")).toDF("k", "v")
      .write.format("delta-lite").mode("overwrite").save(root)
    assert(spark.read.format("delta-lite").load(root)
      .as[(Long, String)].collect().toSeq == Seq((9L, "z")))
    assert(spark.read.format("delta-lite").option("versionAsOf", 0)
      .load(root).as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }

  test("readChangeFeed batch options work on a path table") {
    val root = tmp()
    val t = DeltaLite(spark, root, "k")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    t.setTableProperties(Map("enableChangeDataFeed" -> "true"))
    t.upsert(Seq((2L, "B"), (3L, "c")).toDF("k", "v"), "k")
    val feed = spark.read.format("delta-lite")
      .option("readChangeFeed", "true").option("startingVersion", 2)
      .load(root)
      .select($"k", $"_change_type").as[(Long, String)].collect().toSet
    assert(feed == Set((2L, "update_preimage"), (2L, "update_postimage"),
      (3L, "insert")), feed)
  }

  test("reading a nonexistent path fails loudly; write needs explicit mode") {
    val root = tmp()
    val e = intercept[Exception](
      spark.read.format("delta-lite").load(root).collect())
    assert(e.getMessage.contains("no DeltaLite table"), e.getMessage)
    // default ErrorIfExists is not a DSv2 TableProvider mode — loud
    intercept[Exception](
      Seq((1L, "a")).toDF("k", "v").write.format("delta-lite").save(root))
  }

  test("path reads substitute to the pushdown scan (filters reach parquet)") {
    val root = tmp()
    spark.range(1000).selectExpr("id AS k", "cast(id % 7 AS string) AS v")
      .write.format("delta-lite").mode("append").save(root)
    val df = spark.read.format("delta-lite").load(root).where($"k" === 42)
    val plan = physicalPlan(df)
    assert(plan.contains("PushedFilters") &&
      "PushedFilters: \\[[^\\]]*EqualTo\\(k,42\\)".r.findFirstIn(plan).nonEmpty,
      plan.take(600))
    assert(df.count() == 1)
  }

  test("mergeSchema append evolves the table; plain append stays strict") {
    val root = tmp()
    Seq((1L, "a")).toDF("k", "v")
      .write.format("delta-lite").mode("append").save(root)
    // strict by default: a widened batch is rejected loudly
    intercept[Exception](
      Seq((2L, "b", 9.5)).toDF("k", "v", "score")
        .write.format("delta-lite").mode("append").save(root))
    // with mergeSchema the new column widens the log; old rows read null
    Seq((2L, "b", 9.5)).toDF("k", "v", "score")
      .write.format("delta-lite").option("mergeSchema", "true")
      .mode("append").save(root)
    val got = spark.read.format("delta-lite").load(root)
      .orderBy("k").as[(Long, String, Option[Double])].collect().toSeq
    assert(got == Seq((1L, "a", None), (2L, "b", Some(9.5))), got)
    // a conflicting TYPE is still loud, merge or not
    val e = intercept[Exception](
      Seq((3L, "c", "oops")).toDF("k", "v", "score")
        .write.format("delta-lite").option("mergeSchema", "true")
        .mode("append").save(root))
    assert(e.getMessage.toLowerCase.contains("cast") ||
      e.getMessage.contains("score"), e.getMessage)
  }

  test("partitionBy on the first save creates a partitioned table; later writes keep it") {
    val root = tmp()
    spark.range(100).selectExpr("id AS k", "cast(id % 4 AS string) AS p")
      .write.format("delta-lite").partitionBy("p").mode("append").save(root)
    assert(DeltaLite(spark, root).partitionColumns == Seq("p"))
    // a later un-hinted append keeps the table's spec (no silent flip)
    spark.range(100, 110).selectExpr("id AS k", "cast(id % 4 AS string) AS p")
      .write.format("delta-lite").mode("append").save(root)
    val df = spark.read.format("delta-lite").load(root).where($"p" === "2")
    assert(df.count() == 27)
    // partition pruning: the filter prunes to the p=2 files
    val scanned = df.select(input_file_name()).distinct().collect()
      .map(_.getString(0))
    assert(scanned.nonEmpty && scanned.forall(_.contains("p=2")),
      scanned.take(3).mkString(","))
  }

  test("concurrent path appends: OCC retries, no lost update") {
    val root = tmp()
    Seq((0L, "seed")).toDF("k", "v")
      .write.format("delta-lite").mode("append").save(root)
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(4)
    val gate = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (1 to 4).foreach { i =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          gate.await()
          try Seq((i.toLong, s"w$i")).toDF("k", "v")
            .write.format("delta-lite").mode("append").save(root)
          catch { case t: Throwable => errs.add(t) }
        }
      })
    }
    gate.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(errs.isEmpty, errs.toArray.mkString("; "))
    // every writer's row landed exactly once — no lost updates
    val ks = spark.read.format("delta-lite").load(root)
      .select("k").as[Long].collect().sorted.toSeq
    assert(ks == Seq(0L, 1L, 2L, 3L, 4L), ks)
    assert(DeltaLite(spark, root).latestVersion.contains(4))
  }

  test("writeStream.format path sink + V1 streaming read under one name") {
    val root = tmp()
    val ckpt = Files.createTempDirectory("graft-pathds-ck").toString
    // seed the table (streaming writes need a committed schema)
    Seq((0L, "seed")).toDF("k", "v")
      .write.format("delta-lite").mode("append").save(root)
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    src.addData((1L, "a"), (2L, "b"))
    val q = src.toDF().toDF("k", "v").writeStream
      .format("delta-lite").option("checkpointLocation", ckpt)
      .start(root)
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.format("delta-lite").load(root).count() == 3)
    // the V1 streaming READ still resolves under the same short name
    val outDir = Files.createTempDirectory("graft-pathds-out").toString
    val ck2 = Files.createTempDirectory("graft-pathds-ck2").toString
    val q2 = spark.readStream.format("delta-lite").option("path", root)
      .load().writeStream.format("memory").queryName("pathds_tail")
      .option("checkpointLocation", ck2).start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.table("pathds_tail").count() == 3, outDir)
  }
}
