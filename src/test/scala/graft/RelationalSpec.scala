package graft

import graft.queries.Relational

class RelationalSpec extends SparkSpec {

  test("q1 pricing summary: groups, columns, invariants") {
    val df = Relational.q1PricingSummary(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 9) // ≤ |returnflag|×|linestatus|
    assert(df.columns.toSeq == Seq("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "sum_charge", "avg_qty", "avg_price",
      "avg_disc", "count_order"))
    rows.foreach { r =>
      val sumQty = r.getAs[Double]("sum_qty")
      val cnt = r.getAs[Long]("count_order")
      assert(math.abs(r.getAs[Double]("avg_qty") - sumQty / cnt) < 1e-9)
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
      assert(r.getAs[Double]("sum_charge") >= r.getAs[Double]("sum_disc_price"))
    }
  }

  test("q1 plan: filter pushed to parquet scan, partial aggregation present") {
    val plan = physicalPlan(Relational.q1PricingSummary(spark, sf))
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"))
    assert(plan.contains("HashAggregate"))
  }

  test("q3 shipping priority: top-10, broadcast for customer dim") {
    val df = Relational.q3ShippingPriority(spark, sf)
    val plan = physicalPlan(df)
    assert(plan.contains("BroadcastHashJoin"))
    val rows = df.collect()
    assert(rows.length <= 10)
    // revenue sorted descending
    val revs = rows.map(_.getAs[Double]("revenue")).toSeq
    assert(revs == revs.sortBy(-_))
  }

  test("q4 order priority: semi join, counts positive") {
    val rows = Relational.q4OrderPriority(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("order_count") > 0))
  }

  test("q5 local supplier: nations of one region only") {
    val rows = Relational.q5LocalSupplier(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 5) // ASIA has 5 nations
  }

  test("q6 revenue forecast: single scalar, pushdown of all predicates") {
    val df = Relational.q6RevenueForecast(spark, sf)
    val plan = physicalPlan(df)
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("l_discount") && plan.contains("l_quantity"))
    assert(df.count() == 1)
  }

  test("anti join ∪ semi join partition customers") {
    import org.apache.spark.sql.functions._
    val anti = Relational.qAntiJoin(spark, sf).count()
    val cust = Tables.customer(spark, sf).count()
    val ord96 = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val semi = Tables.customer(spark, sf)
      .join(ord96, col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(anti + semi == cust)
    assert(anti > 0 && semi > 0)
  }

  test("rollup: grand total row equals table size") {
    val rows = Relational.qRollup(spark, sf).collect()
    val total = rows.find(r => r.isNullAt(0) && r.isNullAt(1)).get
    assert(total.getAs[Long]("n_cust") == Tables.customer(spark, sf).count())
  }

  test("cube: contains rollup's sets plus segment-only margins") {
    val cube = Relational.qCube(spark, sf).collect()
    val rollup = Relational.qRollup(spark, sf).collect()
    assert(cube.length > rollup.length)
    val total = cube.find(r => r.isNullAt(0) && r.isNullAt(1)).get
    assert(total.getAs[Long]("n_cust") == Tables.customer(spark, sf).count())
    // segment-only margin rows exist in cube but not rollup
    assert(cube.exists(r => r.isNullAt(0) && !r.isNullAt(1)))
    assert(!rollup.exists(r => r.isNullAt(0) && !r.isNullAt(1)))
  }

  test("window running: per-partition running sum is monotone") {
    val rows = Relational.qWindowRunning(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("l_suppkey")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rn"))
      val runs = sorted.map(_.getAs[Double]("running_qty")).toSeq
      assert(runs == runs.sorted)
    }
  }

  test("topk per group: exactly ≤3 per priority, rank consistent") {
    val rows = Relational.qTopkPerGroup(spark, sf).collect()
    rows.groupBy(_.getAs[String]("o_orderpriority")).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val prices = rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("o_totalprice")).toSeq
      assert(prices == prices.sortBy(-_))
    }
  }

  test("sort limit plan uses TakeOrderedAndProject (no global sort)") {
    val df = Relational.qSortLimit(spark, sf)
    assert(physicalPlan(df).contains("TakeOrderedAndProject"))
    assert(df.count() == 25)
  }

  test("scalar subquery: all results above global average") {
    import org.apache.spark.sql.functions._
    val avgBal = Tables.customer(spark, sf)
      .agg(avg("c_acctbal")).collect()(0).getDouble(0)
    val rows = Relational.qScalarSubquery(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("c_acctbal") > avgBal - 1e-6))
  }

  test("union dedup: distinct nation keys") {
    val rows = Relational.qUnionDedup(spark, sf).collect()
    val keys = rows.map(_.getAs[Int]("nationkey")).toSeq
    assert(keys == keys.distinct && keys == keys.sorted)
  }

  test("lag/lead inverse relationship") {
    val rows = Relational.qLagLead(spark, sf).collect()
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    byCust.foreach { case (_, rs) =>
      val seq = rs.sortBy(r => (r.getAs[java.sql.Date]("order_date").toString,
        r.getAs[Long]("o_orderkey")))
      seq.sliding(2).foreach {
        case Array(a, b) =>
          // b.prev == a.cur and a.next == b.cur
          assert(b.getAs[Double]("prev_price") == a.getAs[Double]("o_totalprice"))
          assert(a.getAs[Double]("next_price") == b.getAs[Double]("o_totalprice"))
        case _ =>
      }
    }
  }

  test("q11 important stock: share threshold holds, dims broadcast") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Relational.q11ImportantStock(spark, sf)
    val plan = physicalPlan(df)
    assert(plan.contains("BroadcastHashJoin"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    val vals = rows.map(_.getAs[Double]("part_value")).toSeq
    assert(vals == vals.sortBy(-_))
    // every reported part really exceeds 2× the mean part value
    val perPart = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf), $"l_suppkey" === $"s_suppkey")
      .join(Tables.nation(spark, sf).filter($"n_nationkey" < 8),
        $"s_nationkey" === $"n_nationkey")
      .groupBy($"l_partkey")
      .agg(sum(($"l_extendedprice".cast("decimal(12,2)") *
        (lit(1).cast("decimal(12,2)") - $"l_discount".cast("decimal(12,2)"))))
        .as("v"))
      .select($"v".cast("double")).collect().map(_.getDouble(0))
    val threshold = perPart.sum / perPart.length * 2
    vals.foreach(v => assert(v > threshold * 0.999))
    assert(rows.length ==
      perPart.count(_ > perPart.sum / perPart.length * 2))
  }

  test("q_profile: one-pass stats agree with direct counts") {
    import spark.implicits._
    val r = Relational.qProfile(spark, sf).collect()(0)
    val li = Tables.lineitem(spark, sf)
    assert(r.getAs[Long]("n_rows") == li.count())
    assert(r.getAs[Long]("n_orders") ==
      li.select($"l_orderkey").distinct().count())
    assert(r.getAs[Long]("n_null_flag") == 0L)
    assert(r.getAs[Double]("min_qty") <= r.getAs[Double]("max_qty"))
    val avg = r.getAs[Double]("avg_qty")
    assert(avg >= r.getAs[Double]("min_qty") && avg <= r.getAs[Double]("max_qty"))
  }
}
