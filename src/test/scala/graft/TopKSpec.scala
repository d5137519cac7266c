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

  test("partial pass bounds shuffle volume to groups × partitions × k") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val n = 10000
      val parts = 8
      val input = spark.range(n).repartition(parts)
        .select(($"id" % 5).as("grp"), $"id".as("v"))
      val df = TopK.perGroup(input, Seq($"grp"), Seq($"v".desc), k = 3)
      df.collect()
      val plan = df.queryExecution.executedPlan
      val planStr = plan.toString()
      assert(planStr.contains("TopKPerGroupPartial") &&
        planStr.contains("TopKPerGroupFinal"), planStr)
      // the partial exec sits below the exchange: what crosses the wire
      // is its bounded output, not the input
      val topKShuffle = plan.collect {
        case e: ShuffleExchangeExec
          if e.child.toString().contains("TopKPerGroupPartial") => e
      }
      assert(topKShuffle.nonEmpty, planStr)
      val written = topKShuffle.head.metrics("shuffleRecordsWritten").value
      assert(written <= 5L * parts * 3,
        s"shuffled $written rows, expected <= ${5 * parts * 3}")
      assert(written < n, s"shuffled $written rows — no reduction vs input $n")
      // and the answer is still exact
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (0 until 5).flatMap(g =>
        (0 until n).filter(_ % 5 == g).sorted.reverse.take(3)
          .map(v => (g.toLong, v.toLong))).toSet
      assert(got == want)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("optimizer rule rewrites the window idiom to the heap operator") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    TopK.register(spark)
    val w = Window.partitionBy($"l_returnflag")
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
    def idiom() = Tables.lineitem(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
    // rank dropped above the filter → rewritten
    val rewritten = idiom().select("l_returnflag", "l_orderkey", "l_extendedprice")
    assert(rewritten.queryExecution.optimizedPlan.collect {
      case t: graft.plans.TopKPerGroup => t
    }.nonEmpty, rewritten.queryExecution.optimizedPlan.toString)
    // rank kept in the output → NOT rewritten (schema must survive)
    val keepsRank = idiom().select("l_returnflag", "l_orderkey", "rn")
    assert(keepsRank.queryExecution.optimizedPlan.collect {
      case t: graft.plans.TopKPerGroup => t
    }.isEmpty)
    // identical rows to the unrewritten computation
    val got = rewritten.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val want = keepsRank.select("l_returnflag", "l_orderkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got.map(t => (t._1, t._2)) == want)
    assert(got.size == want.size)
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
