package graft

import graft.plans.TopK
import graft.queries.Relational
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  test("custom TopKPerGroup matches the window rank+filter result") {
    val viaWindow = Relational.qTopkPerGroup(spark, sf).collect()
      .map(r => (r.getAs[String]("o_orderpriority"), r.getAs[Long]("o_orderkey"),
        r.getAs[Double]("o_totalprice"))).toSet
    val viaCustom = Relational.qTopkCustom(spark, sf).collect()
      .map(r => (r.getAs[String]("o_orderpriority"), r.getAs[Long]("o_orderkey"),
        r.getAs[Double]("o_totalprice"))).toSet
    assert(viaCustom == viaWindow,
      s"missing=${viaWindow -- viaCustom} extra=${viaCustom -- viaWindow}")
  }

  test("physical plan uses TopKPerGroupExec, not Window") {
    val df = Relational.qTopkCustom(spark, sf)
    val plan = physicalPlan(df)
    assert(plan.contains("TopKPerGroup"), plan.take(500))
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window "))
  }

  test("arbitrary k and ascending order through the public API") {
    import spark.implicits._
    val cheapest2 = TopK.perGroup(Tables.orders(spark, sf),
      Seq($"o_orderpriority"), Seq($"o_totalprice", $"o_orderkey"), k = 2)
    val rows = cheapest2.collect()
    rows.groupBy(_.getAs[String]("o_orderpriority")).foreach { case (p, rs) =>
      assert(rs.length <= 2)
      // each kept row is within the true bottom-2 for its group
      val truth = Tables.orders(spark, sf)
        .filter($"o_orderpriority" === p)
        .orderBy($"o_totalprice", $"o_orderkey")
        .limit(2).collect().map(_.getAs[Long]("o_orderkey")).toSet
      assert(rs.map(_.getAs[Long]("o_orderkey")).toSet == truth)
    }
  }
}
