package graft

import graft.functions.BloomFunctions
import graft.ops.RuntimeFilter
import graft.queries.Relational
import org.apache.spark.sql.functions._

/** Bloom runtime-filter semantics + plan shape, and plan audits for the
  * round-3 relational additions (SURVEY.md §2a).
  */
class RuntimeFilterSpec extends SparkSpec {

  test("bloom expression: no false negatives, bounded false positives") {
    val members = spark.range(0, 1000).toDF("k")
    val bits = RuntimeFilter.buildBloom(members, "k", expectedItems = 1000, fpp = 0.01)
    val probed = spark.range(0, 20000).toDF("k")
      .filter(BloomFunctions.bloom_might_contain(col("k"), bits))
      .collect().map(_.getLong(0)).toSet
    assert((0L until 1000L).forall(probed.contains), "bloom dropped a member")
    val fps = probed.count(_ >= 1000)
    // 19k non-members at fpp=0.01 → expect ~190; 3× slack for variance
    assert(fps <= 600, s"false-positive count $fps out of bound")
  }

  test("bloom-pruned join result equals the plain join") {
    val dim = Tables.supplier(spark, sf).filter(col("s_nationkey") === 3)
      .select(col("s_suppkey"), col("s_nationkey"))
    val pruned = RuntimeFilter.bloomPrunedJoin(
        Tables.lineitem(spark, sf), dim, "l_suppkey", "s_suppkey",
        expectedItems = 10000L)
      .groupBy(col("s_suppkey")).count()
      .orderBy(col("s_suppkey")).collect()
    val plain = Tables.lineitem(spark, sf)
      .join(dim, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey")).count()
      .orderBy(col("s_suppkey")).collect()
    assert(pruned.toSeq == plain.toSeq)
  }

  test("bloom probe runs below the join (map-side scan filter)") {
    val plan = physicalPlan(Relational.qBloomPrunedJoin(spark, sf))
    val probeIdx = plan.toLowerCase.indexOf("bloommightcontain")
    val joinIdx = plan.indexOf("Join")
    assert(probeIdx >= 0, "bloom probe not in plan")
    // tree prints parents first: the probe filter must appear after
    // (i.e. beneath) the join operator
    assert(joinIdx >= 0 && probeIdx > joinIdx, plan)
  }

  test("unpivot expands map-side (Expand, no extra shuffle before agg)") {
    val plan = physicalPlan(Relational.qUnpivot(spark, sf))
    assert(plan.contains("Expand"), plan)
    // one exchange for the aggregate, one for the final sort — the
    // melt itself must not shuffle
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges\n$plan")
  }

  test("q_not_in plans an anti join (null-aware NOT IN semantics)") {
    val plan = physicalPlan(Relational.qNotIn(spark, sf))
    assert(plan.contains("LeftAnti"), plan)
  }

  test("q14 joins part as broadcast dim") {
    val plan = physicalPlan(Relational.q14PromoRevenue(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
