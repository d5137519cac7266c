package graft

import graft.sources.Sources
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import java.nio.file.Files

class SourcesSpec extends SparkSpec {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("orc round trip preserves schema and rows; raw text reads lines") {
    import spark.implicits._
    val dir = tmp("graft-orc")
    val df = Tables.documents(spark, sf).select("doc_id", "lang", "n_chars")
    Sources.writeOrc(df, s"$dir/orc")
    val back = Sources.orc(spark, s"$dir/orc")
    assert(back.schema == df.schema)
    assert(back.orderBy("doc_id").collect().toSeq ==
      df.orderBy("doc_id").collect().toSeq)
    // predicate pushdown reaches the ORC scan like parquet
    val plan = physicalPlan(Sources.orc(spark, s"$dir/orc")
      .filter(col("doc_id") === 7L))
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,7)"),
      s"no pushdown in:\n$plan")

    Seq("alpha", "beta").toDF("value").write.mode(SaveMode.Overwrite)
      .text(s"$dir/txt")
    assert(Sources.textLines(spark, s"$dir/txt").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("alpha", "beta"))
  }

  test("permissive json ingest: malformed lines quarantine, good rows parse") {
    import spark.implicits._
    val dir = tmp("graft-permissive")
    val lines = Seq(
      """{"id": 1, "name": "ok"}""",
      """{"id": 2 "name": "missing comma"}""", // malformed
      """{"id": 3, "name": "fine"}""",
      """not json at all""")
    Seq(lines.mkString("\n")).toDF("value").write.mode(SaveMode.Overwrite)
      .text(dir + "/in")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, name STRING")
    val (good, bad) = Sources.jsonLinesQuarantine(spark, dir + "/in", schema)
    assert(good.columns.toSeq == Seq("id", "name"))
    assert(good.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((1L, "ok"), (3L, "fine")).sorted)
    // the corrupt rows carry the whole offending line, data fields null
    val badRows = bad.collect()
    assert(badRows.length == 2)
    assert(badRows.forall(_.isNullAt(0)))
    assert(badRows.map(_.getAs[String]("_corrupt_record")).exists(_.contains("missing comma")))
    graft.ops.Dedup.releaseCaches()
  }

  test("partitioned parquet write → partition pruning in the scan") {
    import spark.implicits._
    val out = tmp("graft-part") + "/events_by_type"
    Sources.writePartitioned(
      Tables.events(spark, sf).withColumn("etype", $"event_type"),
      out, Seq("etype"))
    val back = Sources.parquet(spark, out).filter($"etype" === "click")
    val clicks = Tables.events(spark, sf).filter($"event_type" === "click").count()
    assert(back.count() == clicks)
    // pruning: only the etype=click directory is read
    val scan = back.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters") && scan.contains("etype"))
  }

  test("bucketed table: join on bucket key plans without shuffle of the big side") {
    import spark.implicits._
    // unique name: a stale warehouse dir from a previous JVM (not in
    // this session's in-memory catalog) makes saveAsTable fail
    val name = s"graft_orders_bucketed_${System.nanoTime()}"
    Sources.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
      name, "o_orderkey", buckets = 8)
    try {
      val t = spark.table(name)
      val self = t.as("a").join(t.as("b"), "o_orderkey")
      assert(self.count() == t.count())
      // both sides bucketed on the join key → no Exchange in the join plan
      val plan = self.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan.take(800))
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("multiline vs line-delimited JSON round trip") {
    import spark.implicits._
    val dir = tmp("graft-json-rt")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    df.write.json(s"$dir/lines") // line-delimited
    assert(Sources.jsonLines(spark, s"$dir/lines").count() == 2)
    Files.writeString(java.nio.file.Paths.get(dir, "multi.json"),
      """[{"id": 1, "v": "a"},
        | {"id": 2, "v": "b"}]""".stripMargin)
    val multi = Sources.multilineJson(spark, s"$dir/multi.json")
    assert(multi.count() == 2 && multi.columns.sorted.toSeq == Seq("id", "v"))
  }

  test("csv with header and explicit schema") {
    val dir = tmp("graft-csv")
    Files.writeString(java.nio.file.Paths.get(dir, "d.csv"),
      "id,name\n1,alpha\n2,beta\n")
    val inferred = Sources.csv(spark, s"$dir/d.csv")
    assert(inferred.count() == 2)
    assert(inferred.schema("id").dataType.typeName == "integer")
    val typed = Sources.csv(spark, s"$dir/d.csv",
      schema = Some(org.apache.spark.sql.types.StructType.fromDDL("id LONG, name STRING")))
    assert(typed.schema("id").dataType.typeName == "long")
  }
}
