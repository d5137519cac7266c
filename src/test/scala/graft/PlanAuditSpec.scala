package graft

import graft.ops.Skew
import graft.queries.{Relational, Text, Vectors}
import org.apache.spark.sql.functions._

/** Explain-plan audit: the shapes that matter at 100 TB, asserted on
  * the real physical plans (SURVEY.md §4/§6).
  */
class PlanAuditSpec extends SparkSpec {

  test("q6: scan reads only the referenced columns (ReadSchema pruning)") {
    val plan = physicalPlan(Relational.q6RevenueForecast(spark, sf))
    val readSchema = "ReadSchema:.*".r.findFirstIn(plan).getOrElse("")
    assert(readSchema.contains("l_shipdate") && readSchema.contains("l_discount"))
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_returnflag"),
      readSchema)
  }

  test("q5: all dimension joins broadcast; no sort-merge for dims") {
    val plan = physicalPlan(Relational.q5LocalSupplier(spark, sf))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts")
  }

  test("q1: partial aggregation before the exchange") {
    val plan = physicalPlan(Relational.q1PricingSummary(spark, sf))
    val exchangeIdx = plan.indexOf("Exchange")
    val partialIdx = plan.indexOf("HashAggregate(keys=[l_returnflag")
    assert(exchangeIdx >= 0 && partialIdx >= 0)
    // a partial HashAggregate must appear below (after, in tree print)
    assert(plan.lastIndexOf("HashAggregate") > exchangeIdx)
  }

  test("text pipeline stays in whole-stage codegen (no UDFs)") {
    val df = Text.quality(spark, sf)
    df.collect() // finalize the adaptive plan so codegen spans are visible
    val plan = df.queryExecution.executedPlan.toString()
    // "*(n)" is the compact WholeStageCodegen marker; the stopword
    // filter lambda is a (interpreted) higher-order fn but no stage
    // falls back to Python/Scala UDF evaluation
    assert(plan.contains("*("))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  test("ann brute force: query side broadcast, single pass over candidates") {
    val plan = physicalPlan(Vectors.annBruteForce(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"))
  }

  test("salted join: spreads a hot key and preserves join semantics") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val parts = Tables.part(spark, sf).select("p_partkey", "p_name")
    val plain = li.join(parts, $"l_partkey" === $"p_partkey").count()
    val salted = Skew.saltedJoin(
      li.withColumnRenamed("l_partkey", "p_partkey"), parts,
      key = "p_partkey", rowDisambiguator = "l_orderkey", salts = 8)
    assert(salted.count() == plain)
    // salt column is internal only
    assert(!salted.columns.contains("__salt"))
  }
}
