package graft

import graft.etl.DeltaLite
import graft.plans.MaterializedViews
import org.apache.spark.sql.functions._

/** Materialized-view substitution: an identical aggregate reads the
  * summary table; anything else is untouched.
  */
class MaterializedViewSpec extends SparkSpec {

  private def defn = Tables.events(spark, sf)
    .groupBy(col("user_id"))
    .agg(count(lit(1)).as("n_events"),
      sum(col("value").cast("decimal(22,2)")).as("sum_value"))

  test("registered aggregate is answered from the view, others untouched") {
    MaterializedViews.clear()
    val t = DeltaLite(spark,
      java.nio.file.Files.createTempDirectory("graft-mv").toString)
    t.append(defn)
    MaterializedViews.register(spark, defn, () => t.read())
    try {
      // the same aggregate written independently, with a consumer above
      val q = Tables.events(spark, sf)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(22,2)")).as("sum_value"))
        .filter(col("n_events") >= 10)
      val opt = q.queryExecution.optimizedPlan
      assert(!opt.toString.contains("Aggregate"),
        s"aggregate should be substituted by the view:\n$opt")
      assert(q.inputFiles.exists(_.contains("graft-mv")),
        s"plan should scan the MV table:\n$opt")
      assert(!q.inputFiles.exists(_.contains("events.parquet")),
        "raw events must not be scanned")
      // identical rows to computing from the raw events
      val raw = defn.filter(col("n_events") >= 10).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).toSet
      val got = q.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).toSet
      assert(got == raw)

      // a DIFFERENT aggregate over the same source is not rewritten
      val other = Tables.events(spark, sf)
        .groupBy(col("user_id")).agg(max(col("value")).as("mx"))
      assert(other.queryExecution.optimizedPlan.toString.contains("Aggregate"))
      assert(other.count() > 0)
    } finally MaterializedViews.clear()
  }

  test("withoutRewrite: a full-recompute refresh reads the raw source") {
    import spark.implicits._
    MaterializedViews.clear()
    Seq((1L, 1.0), (1L, 2.0), (2L, 5.0)).toDF("k", "v")
      .createOrReplaceTempView("mvr_src")
    def defn = spark.table("mvr_src").groupBy($"k")
      .agg(count(lit(1)).as("n"))
    val t = DeltaLite(spark,
      java.nio.file.Files.createTempDirectory("graft-mv3").toString)
    // deliberately STALE view contents
    t.append(Seq((1L, 99L), (2L, 99L)).toDF("k", "n"))
    MaterializedViews.register(spark, defn, () => t.read())
    try {
      // substituted path serves the (stale) view…
      assert(defn.collect().map(_.getLong(1)).toSet == Set(99L))
      // …the bypass recomputes from the raw source (action INSIDE body)
      val fresh = MaterializedViews.withoutRewrite(spark) { defn.collect() }
      assert(fresh.map(r => (r.getLong(0), r.getLong(1))).toSet ==
        Set((1L, 2L), (2L, 1L)))
      // and the rule is restored afterwards
      assert(defn.collect().map(_.getLong(1)).toSet == Set(99L))
    } finally MaterializedViews.clear()
  }

  test("end-to-end: writeStream-maintained view answers substituted queries") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    MaterializedViews.clear()
    val input = MemoryStream[(Long, Double)]
    val t = DeltaLite(spark,
      java.nio.file.Files.createTempDirectory("graft-mv-stream").toString,
      statsKey = "k")
    def aggSpec(d: org.apache.spark.sql.DataFrame) =
      d.toDF("k", "v").groupBy($"k")
        .agg(count(lit(1)).as("n"), sum($"v".cast("decimal(22,2)")).as("s"))
    val q = input.toDF().writeStream
      .outputMode("append")
      .foreachBatch(graft.streaming.DeltaSink.aggregateWriter(t, "mvs", "k",
        aggSpec, Seq("n" -> ((a, b) => a + b),
          "s" -> ((a, b) => (a + b).cast("decimal(22,2)")))))
      .start()
    try {
      input.addData((1L, 1.0), (1L, 2.0), (2L, 4.0))
      q.processAllAvailable()
      // register the view against a stable definition
      Seq((0L, 0.0)).toDF("k", "v").limit(0).createOrReplaceTempView("mvs_def")
      val definition = aggSpec(spark.table("mvs_def"))
      MaterializedViews.register(spark, definition, () => t.read())
      val sub = aggSpec(spark.table("mvs_def"))
      assert(sub.inputFiles.exists(_.contains("graft-mv-stream")))
      assert(sub.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        Set((1L, 2L), (2L, 1L)))
      // more stream data lands; the substituted query sees it
      input.addData((2L, 9.0), (3L, 5.0))
      q.processAllAvailable()
      assert(aggSpec(spark.table("mvs_def")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet ==
        Set((1L, 2L), (2L, 2L), (3L, 1L)))
    } finally { q.stop(); MaterializedViews.clear() }
  }

  test("stream-maintained view serves fresh results through the rewrite") {
    import spark.implicits._
    MaterializedViews.clear()
    val src = Seq((1L, 10.0), (1L, 5.0), (2L, 7.0)).toDF("k", "v")
    def defnOf(d: org.apache.spark.sql.DataFrame) = d.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v".cast("decimal(22,2)")).as("s"))
    val t = DeltaLite(spark,
      java.nio.file.Files.createTempDirectory("graft-mv2").toString,
      statsKey = "k")
    val writer = graft.streaming.DeltaSink.aggregateWriter(t, "mv", "k",
      defnOf, Seq("n" -> ((a, b) => a + b),
        "s" -> ((a, b) => (a + b).cast("decimal(22,2)"))))
    writer(src, 0L)
    // register against a STABLE definition plan (the source relation)
    src.createOrReplaceTempView("mv_src")
    val definition = defnOf(spark.table("mv_src"))
    MaterializedViews.register(spark, definition, () => t.read())
    try {
      val q1 = defnOf(spark.table("mv_src"))
      assert(q1.inputFiles.exists(_.contains("graft-mv2")))
      assert(q1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        Set((1L, 2L), (2L, 1L)))
      // a new micro-batch lands in the view; the SAME query sees it
      writer(Seq((2L, 3.0), (3L, 1.0)).toDF("k", "v"), 1L)
      val q2 = defnOf(spark.table("mv_src"))
      assert(q2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        Set((1L, 2L), (2L, 2L), (3L, 1L)))
    } finally MaterializedViews.clear()
  }
}
