package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampType}

/** Relational analytic core (SURVEY.md §2a) — TPC-H-shaped queries over
  * the testdata star schema.
  *
  * Determinism contract with the DuckDB oracle: monetary doubles are
  * clean 2-dp values, so we cast operands to DECIMAL before aggregating
  * (exact decimal arithmetic in both engines) and cast the final
  * aggregate to double. Divisions happen after the cast, in double, so
  * both engines divide identical IEEE values. This makes sums
  * bit-identical regardless of partial-aggregation order.
  */
object Relational {

  /** Exact-sum helper: SUM(CAST(c AS DECIMAL(12,2))) cast back to double. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(12, 2))).cast("double")
  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  private def ts(s: String): Column = lit(s).cast(TimestampType)

  /** Pricing summary: scan → filter → hash-agg with map-side partials.
    * Shape of TPC-H Q1 (public spec). Scales: single shuffle on the
    * 6-value grouping key; partial agg collapses ~all rows map-side.
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= ts("1998-09-02 00:00:00"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        sum(dec($"l_extendedprice") * (dec(lit(1)) - dec($"l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(dec($"l_extendedprice") * (dec(lit(1)) - dec($"l_discount"))
          * (dec(lit(1)) + dec($"l_tax"))).cast("double").as("sum_charge"),
        (dsum($"l_quantity") / count(lit(1))).as("avg_qty"),
        (dsum($"l_extendedprice") / count(lit(1))).as("avg_price"),
        (dsum($"l_discount") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Shipping priority: customer ⋈ orders ⋈ lineitem, top-10 revenue.
    * customer is small → broadcast; orders⋈lineitem shuffles on the
    * order key; final global top-10 is TakeOrderedAndProject (no full
    * sort at scale).
    */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
    val ord = Tables.orders(s, dir).filter($"o_orderdate" < ts("1998-01-01 00:00:00"))
    val li = Tables.lineitem(s, dir).filter($"l_shipdate" > ts("1998-01-01 00:00:00"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(sum(dec($"l_extendedprice") * (dec(lit(1)) - dec($"l_discount")))
        .cast("double").as("revenue"))
      .select($"l_orderkey", $"revenue",
        $"o_orderdate".cast("date").as("o_orderdate"), $"o_orderpriority")
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  /** Order priority check: EXISTS → left_semi join, then count by
    * priority. Semi join shuffles both sides on the order key but never
    * materializes the pair blowup.
    */
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Tables.orders(s, dir)
      .filter($"o_orderdate" >= ts("1996-01-01 00:00:00") &&
        $"o_orderdate" < ts("1997-01-01 00:00:00"))
    val bigLines = Tables.lineitem(s, dir).filter($"l_quantity" > 45)
    ord.join(bigLines, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  /** Local supplier volume: 6-way join with broadcast dimension chain
    * (region→nation→{customer,supplier}); only orders⋈lineitem shuffles.
    */
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val region = Tables.region(s, dir).filter($"r_name" === "ASIA")
    val nation = Tables.nation(s, dir)
    val cust = Tables.customer(s, dir)
    val supp = Tables.supplier(s, dir)
    val ord = Tables.orders(s, dir)
      .filter($"o_orderdate" >= ts("1996-01-01 00:00:00") &&
        $"o_orderdate" < ts("1998-01-01 00:00:00"))
    val li = Tables.lineitem(s, dir)
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(supp),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(sum(dec($"l_extendedprice") * (dec(lit(1)) - dec($"l_discount")))
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** Forecast revenue change: tight range filter + scalar aggregate.
    * All three predicates push into the parquet scan.
    */
  def q6RevenueForecast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= ts("1996-01-01 00:00:00") &&
        $"l_shipdate" < ts("1997-01-01 00:00:00") &&
        $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
        $"l_quantity" < 24)
      .agg(sum(dec($"l_extendedprice") * dec($"l_discount"))
        .cast("double").as("revenue"))
  }

  /** NOT EXISTS → left_anti join: customers with no 1996 orders. */
  def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord96 = Tables.orders(s, dir)
      .filter($"o_orderdate" >= ts("1996-01-01 00:00:00") &&
        $"o_orderdate" < ts("1997-01-01 00:00:00"))
    Tables.customer(s, dir)
      .join(ord96, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** ROLLUP over nation→segment: grouping-sets expand before the single
    * shuffle; partial aggregation still applies.
    */
  def qRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .rollup($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("n_cust"), dsum($"c_acctbal").as("sum_bal"))
      .orderBy($"c_nationkey".asc_nulls_first, $"c_mktsegment".asc_nulls_first)
  }

  /** Volume shipping between two nations (TPC-H Q7 shape, public spec).
    *
    * The nation-pair predicate is a disjunction spanning both join
    * sides, which Catalyst cannot push through the joins on its own —
    * applied last it would drag the whole fact table through five joins
    * for a 2/N² survivor rate. So we pre-filter BOTH nation dims to the
    * two target nations (2-row broadcasts): the supplier and customer
    * joins then act as semi-filters, pruning ~ (2/N)² of the fact rows
    * before the orders join, and the pair-OR remains only as a cheap
    * residual rejecting the (N1,N1)/(N2,N2) combinations.
    */
  def q7VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val targets = Seq("NATION_1", "NATION_2")
    val n1 = Tables.nation(s, dir).filter($"n_name".isin(targets: _*))
      .select($"n_nationkey".as("s_nkey"), $"n_name".as("supp_nation"))
    val n2 = Tables.nation(s, dir).filter($"n_name".isin(targets: _*))
      .select($"n_nationkey".as("c_nkey"), $"n_name".as("cust_nation"))
    val supp = Tables.supplier(s, dir)
      .join(broadcast(n1), $"s_nationkey" === $"s_nkey")
      .select($"s_suppkey", $"supp_nation")
    val cust = Tables.customer(s, dir)
      .join(broadcast(n2), $"c_nationkey" === $"c_nkey")
      .select($"c_custkey", $"cust_nation")
    Tables.lineitem(s, dir)
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .filter(($"supp_nation" === "NATION_1" && $"cust_nation" === "NATION_2") ||
        ($"supp_nation" === "NATION_2" && $"cust_nation" === "NATION_1"))
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").as("l_year"))
      .agg(sum(dec($"l_extendedprice") * (dec(lit(1)) - dec($"l_discount")))
        .cast("double").as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  /** Returned-item reporting (TPC-H Q10 shape): top 20 customers by
    * revenue lost to returns in a quarter.
    */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_returnflag" === "R")
      .join(Tables.orders(s, dir)
        .filter($"o_orderdate" >= ts("1997-01-01 00:00:00") &&
          $"o_orderdate" < ts("1997-04-01 00:00:00")),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
      .groupBy($"c_custkey", $"c_name", $"c_mktsegment", $"c_acctbal")
      .agg(sum(dec($"l_extendedprice") * (dec(lit(1)) - dec($"l_discount")))
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** GROUP BY + HAVING: post-aggregation predicate (suppliers whose
    * shipped volume clears a floor). HAVING is just a filter above the
    * aggregate — Catalyst keeps the partial-agg pipeline intact.
    */
  def qHaving(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n_lines"), dsum($"l_quantity").as("total_qty"))
      .filter($"total_qty" > 1500.0)
      .orderBy($"l_suppkey")
  }

  /** CUBE over nation×segment: all four grouping sets in one pass. */
  def qCube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .cube($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("n_cust"), dsum($"c_acctbal").as("sum_bal"))
      .orderBy($"c_nationkey".asc_nulls_first, $"c_mktsegment".asc_nulls_first)
  }

  /** Exact + approximate distinct aggregation over the fact table.
    *
    * Shape: one single-distinct aggregate per distinct column, joined
    * on the group key, instead of the multi-distinct form. TWO
    * countDistincts in one aggregate force an Expand — every fact row
    * replicated once per distinct set (×3 with the plain count)
    * through the first exchange — while each single-distinct aggregate
    * plans as a plain two-phase aggregate over a 2-column scan whose
    * map-side partial dedups before the shuffle (guide §2.3/§6; the
    * r15 Expand purge, same values row for row). The joins after
    * aggregation carry ≤ |distinct flags| rows; null-safe equality
    * keeps a hypothetical NULL group exactly as the multi-distinct
    * form would.
    */
  def qDistinctAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val dOrders = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n_orders"))
    val dParts = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n_parts"))
      .withColumnRenamed("l_returnflag", "__rf_p")
    val nRows = li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_rows"))
      .withColumnRenamed("l_returnflag", "__rf_n")
    dOrders
      .join(dParts, $"l_returnflag" <=> $"__rf_p")
      .join(nRows, $"l_returnflag" <=> $"__rf_n")
      .select($"l_returnflag", $"n_orders", $"n_parts", $"n_rows")
      .orderBy($"l_returnflag")
  }

  /** Window: running revenue + row_number per supplier by ship date. */
  def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"l_suppkey").orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
    Tables.lineitem(s, dir)
      .filter($"l_suppkey" <= 10)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("running_qty",
        sum(dec($"l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double"))
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
        $"l_shipdate".cast("date").as("ship_date"), $"rn", $"running_qty")
      .orderBy($"l_suppkey", $"rn")
  }

  /** Top-3 orders by value per priority: rank + filter — the scalable
    * top-k-per-group shape (no global sort).
    */
  def qTopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 3)
      .select($"o_orderpriority", $"rk", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderpriority", $"rk")
  }

  /** Same top-3-per-priority result through the custom whole-operator
    * plan (graft.plans.TopKPerGroup: bounded per-group heaps instead of
    * a window sort — see its scaladoc for the O(n log k) argument).
    */
  def qTopkCustom(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.plans.TopK.perGroup(
      Tables.orders(s, dir),
      groupCols = Seq($"o_orderpriority"),
      orderBy = Seq($"o_totalprice".desc, $"o_orderkey"),
      k = 3)
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderpriority", $"o_totalprice".desc, $"o_orderkey")
  }

  /** The SAME window idiom as [[qTopkPerGroup]] but with the rank
    * column dropped — which lets the injected optimizer rule
    * (`graft.plans.TopKRewrite`) replace the window sort with the
    * whole-operator heap plan automatically. The user writes standard
    * code; the engine picks the O(n log k) operator.
    */
  def qTopkRewritten(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.plans.TopK.register(s)
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderpriority", $"o_totalprice".desc, $"o_orderkey")
  }

  /** Trailing 7-ROW moving average over the daily revenue series —
    * the ROWS-frame companion of the RANGE-frame window (a row frame
    * spans 7 table rows; only the RANGE sibling tracks calendar days
    * across gaps). The window runs over the ALREADY-aggregated daily
    * table (one row per day), so the partitionless frame is a few
    * hundred rows, not the fact scan; sums stay DECIMAL through the
    * frame so the trailing mean is engine-exact.
    */
  def qMovingAvg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.orders(s, dir)
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(dec($"o_totalprice")).as("rev"))
    val w = Window.orderBy($"day").rowsBetween(-6, 0)
    daily
      .select($"day", $"rev".cast("double").as("daily_rev"),
        (sum($"rev").over(w).cast("double") /
          count(lit(1)).over(w)).as("ma7"))
      .orderBy($"day")
  }

  /** Global order + limit → TakeOrderedAndProject (per-partition top-k
    * then merge; never a full sort at scale).
    */
  def qSortLimit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(25)
  }

  /** Scalar aggregate subquery in a predicate: customers above the
    * global average balance. The subquery is a one-row broadcast.
    */
  def qScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir)
    val avgBal = cust.agg((dsum($"c_acctbal") / count(lit(1))).as("a"))
    cust.join(broadcast(avgBal))
      .filter($"c_acctbal" > $"a")
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .orderBy($"c_custkey")
  }

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): nullable
    * derived keys still match their null dimension row instead of
    * silently dropping — the semantics plain `=` gets wrong on
    * null-carrying keys. Planned as a regular hash join (null-safe
    * equality is a valid hash key), not a nested loop.
    */
  def qNullSafeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val seg = when($"c_nationkey" % 5 === 0, lit(null))
      .otherwise($"c_nationkey" % 5)
    val c = Tables.customer(s, dir).select($"c_custkey", seg.as("seg"))
    val d = c.select($"seg").distinct().withColumnRenamed("seg", "d_seg")
    c.join(broadcast(d), $"seg" <=> $"d_seg")
      .groupBy(coalesce($"d_seg".cast("string"), lit("null")).as("seg_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"seg_label")
  }

  /** INTERSECT ALL — multiset intersection (each key survives
    * min(left count, right count) times), vs the distinct-set
    * [[qIntersectExcept]]. Planned as a partial-count join, no
    * explode of duplicates.
    */
  def qIntersectAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
      .select(($"c_nationkey" % 7).cast("int").as("bucket"))
    val sup = Tables.supplier(s, dir)
      .select(($"s_nationkey" % 7).cast("int").as("bucket"))
    c.intersectAll(sup)
      .groupBy($"bucket").agg(count(lit(1)).as("multiplicity"))
      .orderBy($"bucket")
  }

  /** UNION + DISTINCT: nation keys present on either side of trading. */
  def qUnionDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val custNations = Tables.customer(s, dir).select($"c_nationkey".cast("int").as("nationkey"))
    val suppNations = Tables.supplier(s, dir).select($"s_nationkey".cast("int").as("nationkey"))
    custNations.union(suppNations).distinct().orderBy($"nationkey")
  }

  /** Revenue per brand through [[graft.ops.Skew.saltedJoin]]: the salted
    * plan (hot side salted on (key, rowid), dim replicated ×salts) must
    * produce exactly the plain-join answer — which is what the DuckDB
    * oracle computes. Exercises the skew tool under the correctness
    * gate, not just a spec.
    */
  def qSkewSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .withColumnRenamed("l_partkey", "p_partkey")
    val parts = Tables.part(s, dir).select($"p_partkey", $"p_brand")
    graft.ops.Skew.saltedJoin(li, parts, key = "p_partkey",
        rowDisambiguator = "l_orderkey", salts = 8)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_items"),
        sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(12, 2)) - dec($"l_discount")))
          .cast("double").as("revenue"))
      .orderBy($"p_brand")
  }

  /** Explicit GROUPING SETS (beyond rollup/cube's fixed lattices): the
    * two marginals without the cross cells, one pass. Runs as SQL text
    * so the same string drives both engines.
    */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.withTables(s, dir).sql(GroupingSetsSql)
  }

  val GroupingSetsSql: String =
    """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
      |FROM customer
      |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
      |ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin

  /** RANGE-frame window: revenue in the trailing 30-day interval per
    * supplier — a value-based frame (RANGE BETWEEN), not a row count;
    * frame bounds follow the ORDER BY value.
    */
  def qWindowRangeFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val days30 = 30L * 86400L
    val w = Window.partitionBy($"l_suppkey")
      .orderBy(unix_timestamp($"l_shipdate"))
      .rangeBetween(-days30, 0)
    Tables.lineitem(s, dir)
      .filter($"l_suppkey" <= 20)
      .withColumn("rev_30d",
        sum(dec($"l_extendedprice")).over(w).cast("double"))
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
        $"l_shipdate", $"rev_30d")
      .orderBy($"l_suppkey", $"l_shipdate", $"l_orderkey", $"l_linenumber")
  }

  /** INTERSECT / EXCEPT set operations: customers active in both 1995
    * and 1996, and 1995-only customers.
    *
    * Shape: ONE scan of orders (date-pruned to the two years) with a
    * per-customer flag aggregation deriving the cohort, instead of the
    * literal intersect/except form that scanned orders four times and
    * ran two broadcast semi/anti joins (guide §2.4 — the r15 rewrite;
    * plan went 4 scans + 2 joins + 5 aggregates → 1 scan + 2
    * aggregates). Set-identical: INTERSECT = distinct custkeys with
    * activity in both years, EXCEPT = distinct custkeys with 1995 but
    * no 1996 activity — exactly the max-flag predicates per distinct
    * custkey (NULL custkeys group as one key, matching set-op
    * null-safe equality); only-1996 customers get a NULL cohort and
    * are filtered, like rows absent from both set results.
    */
  def qIntersectExcept(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .filter($"o_orderdate" >= ts("1995-01-01 00:00:00") &&
        $"o_orderdate" < ts("1997-01-01 00:00:00"))
      .select($"o_custkey",
        ($"o_orderdate" < ts("1996-01-01 00:00:00")).as("__in95"))
      .groupBy($"o_custkey")
      .agg(max(when($"__in95", 1).otherwise(0)).as("__h95"),
        max(when(!$"__in95", 1).otherwise(0)).as("__h96"))
      .select(when($"__h95" === 1 && $"__h96" === 1, "both")
        .when($"__h95" === 1, "only_1995").as("cohort"))
      .filter($"cohort".isNotNull)
      .groupBy($"cohort").agg(count(lit(1)).as("n_customers"))
      .orderBy($"cohort")
  }

  /** FULL OUTER join: every customer and every order-aggregate row
    * survives — customers with no orders carry null aggregates (the
    * join-type completeness case q_anti_join's left_anti doesn't cover).
    */
  def qFullOuter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir).select($"c_custkey", $"c_name")
    val o = Tables.orders(s, dir).groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total_spend"))
    c.join(o, $"c_custkey" === $"o_custkey", "full_outer")
      .select(coalesce($"c_custkey", $"o_custkey").as("custkey"),
        $"c_name", $"n_orders", $"total_spend")
      .orderBy($"custkey")
  }

  /** Exact percentiles (linear interpolation) per return flag — the
    * ordered-statistic aggregate; both engines implement the standard
    * (n−1)·p interpolation, so results compare exactly on this data.
    */
  def qPercentiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  /** Promo revenue share (TPC-H Q14 shape, public spec): lineitem ⋈
    * part with a conditional aggregate ratio per ship year. part is
    * dim-scale → broadcast; the fact shuffles once on the year key
    * after map-side partials.
    */
  def q14PromoRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = dec($"l_extendedprice") * (dec(lit(1)) - dec($"l_discount"))
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)), $"l_partkey" === $"p_partkey")
      .groupBy(year($"l_shipdate").cast("int").as("l_year"))
      .agg((lit(100.0) * sum(when($"p_type" === "PROMO", rev)
          .otherwise(lit(0).cast(DecimalType(12, 2)))).cast("double")
        / sum(rev).cast("double")).as("promo_pct"))
      .orderBy($"l_year")
  }

  /** Disjunctive join filter (TPC-H Q19 shape): OR-of-ANDs spanning
    * both join sides. Unlike q7's nation pairs, the brand/type arms
    * are NOT independently pushable — the disjunction must evaluate
    * post-join; the plan's job is to keep it a single pass with the
    * quantity range condition pre-pruning the fact scan.
    */
  def qDisjunctiveJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // every arm requires l_quantity >= 1 — hoist the common bound so
    // the scan prunes before the join even though the OR itself can't
    Tables.lineitem(s, dir).filter($"l_quantity" >= 1)
      .join(broadcast(Tables.part(s, dir)), $"l_partkey" === $"p_partkey")
      .filter(($"p_brand" === "Brand#1" && $"l_quantity".between(1, 20)) ||
        ($"p_brand" === "Brand#2" && $"l_quantity".between(10, 30)) ||
        ($"p_type" === "PROMO" && $"l_quantity" >= 40))
      .agg(sum(dec($"l_extendedprice") * (dec(lit(1)) - dec($"l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** UNPIVOT (wide → long melt): the four lineitem measures become
    * (measure, value) rows, then a per-measure aggregate. Spark's
    * `unpivot` expands map-side (no shuffle until the agg), like the
    * oracle's UNION ALL but in one scan of the input.
    */
  def qUnpivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select($"l_returnflag", $"l_quantity", $"l_extendedprice",
        $"l_discount", $"l_tax")
      .unpivot(Array($"l_returnflag"),
        Array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
        "measure", "value")
      .groupBy($"l_returnflag", $"measure")
      .agg(count(lit(1)).as("n"), dsum($"value").as("total"))
      .orderBy($"l_returnflag", $"measure")
  }

  /** Distribution windows: ntile quartiles, percent_rank, cume_dist of
    * customer balances within each nation. The unique (acctbal,
    * custkey) sort key makes ranks tie-free, so the rank-derived
    * doubles are exact in both engines.
    */
  def qNtile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal", $"c_custkey")
    Tables.customer(s, dir)
      .select($"c_custkey", $"c_nationkey", $"c_acctbal",
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy($"c_nationkey", $"c_acctbal", $"c_custkey")
  }

  /** NOT IN (subquery) through the SQL surface: Spark must plan the
    * null-aware anti join (a plain anti join would be wrong if the
    * subquery could yield nulls — the planner can't prove it can't
    * from the parquet schema). One string, two engines.
    */
  def qNotIn(s: SparkSession, dir: String): DataFrame =
    graft.GraftSession.withTables(s, dir).sql(NotInSql)

  val NotInSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
      |                        WHERE o_orderpriority = '1-URGENT'
      |                          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin

  /** Bloom-pruned join ([[graft.ops.RuntimeFilter]]): revenue for the
    * suppliers of one nation. The dim's keys build a Bloom filter that
    * prunes the lineitem scan map-side before the join shuffle; the
    * oracle computes the plain join — results must be identical
    * (false positives die in the real join).
    */
  def qBloomPrunedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dim = Tables.supplier(s, dir).filter($"s_nationkey" === 3)
      .select($"s_suppkey", $"s_nationkey")
    graft.ops.RuntimeFilter.bloomPrunedJoin(
        Tables.lineitem(s, dir), dim, "l_suppkey", "s_suppkey",
        expectedItems = 10000L)
      .groupBy($"s_suppkey")
      .agg(count(lit(1)).as("n_lines"), dsum($"l_extendedprice").as("revenue"))
      .orderBy($"s_suppkey")
  }

  /** Mergeable quantile sketch ([[graft.functions.QuantileSketch]]):
    * per-group percentiles with O(capacity) state and map-side partial
    * merges. At the gate's SF the groups are under capacity, so the
    * sketch's answer is the exact interpolated percentile the oracle
    * computes; past capacity it degrades to a bounded-rank-error
    * estimate (SketchSpec asserts the bound).
    */
  def qQuantileSketch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qs = graft.functions.SketchFunctions.quantile_sketch(
      $"l_quantity", Seq(0.25, 0.5, 0.75, 0.9), capacity = 1 << 17)
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(qs.as("q"), count(lit(1)).as("n"))
      .select($"l_returnflag", $"q"(0).as("p25"), $"q"(1).as("p50"),
        $"q"(2).as("p75"), $"q"(3).as("p90"), $"n")
      .orderBy($"l_returnflag")
  }

  /** Market share (TPC-H Q8 shape): a region's customers' spend, split
    * by whether the supplying nation is the target nation — conditional
    * agg over the largest join tree in the suite (6 tables, all dims
    * broadcast, single fact shuffle).
    */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = (dec($"l_extendedprice") * (dec(lit(1)) - dec($"l_discount")))
    val nations = Tables.nation(s, dir)
    val custSide = Tables.customer(s, dir)
      .join(nations.select($"n_nationkey".as("cn_key"), $"n_regionkey"),
        $"c_nationkey" === $"cn_key")
      .join(Tables.region(s, dir).filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
      .select($"c_custkey")
    val suppSide = Tables.supplier(s, dir)
      .join(nations.select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation")),
        $"s_nationkey" === $"sn_key")
      .select($"s_suppkey", $"supp_nation")
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).filter(
          $"o_orderdate" >= ts("1996-01-01 00:00:00") &&
          $"o_orderdate" < ts("1998-01-01 00:00:00")),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(custSide), $"o_custkey" === $"c_custkey")
      .join(broadcast(suppSide), $"l_suppkey" === $"s_suppkey")
      .groupBy(year($"o_orderdate").cast("int").as("o_year"))
      .agg((sum(when($"supp_nation" === "NATION_3", rev)
          .otherwise(lit(0).cast(DecimalType(12, 2)))).cast("double")
        / sum(rev).cast("double")).as("mkt_share"))
      .orderBy($"o_year")
  }

  /** Customer order-count distribution (TPC-H Q13 shape): LEFT OUTER
    * join so zero-order customers survive, then a histogram of the
    * per-customer counts — two aggregations back to back, the second
    * over the first's (much smaller) output.
    */
  def q13OrderDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perCust = Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter($"o_orderpriority" =!= "1-URGENT"),
        $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count")) // count(col): nulls don't count
    perCust.groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  /** Small-quantity-order revenue (TPC-H Q17 shape): lineitems under
    * 40% of their part's average quantity. The per-part average is a
    * self-aggregation joined back to the fact — the correlated-scalar-
    * subquery decorrelation pattern, written directly as the plan
    * Catalyst would decorrelate to.
    */
  def q17SmallQty(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // prune by PART before the self-aggregation: the per-part average
    // only matters for the filtered brand's parts, and restricting by
    // part key (not by lineitem attributes) keeps every lineitem of a
    // surviving part, so each part's average is unchanged — the
    // aggregate runs over brand-selectivity × |lineitem| rows instead
    // of all of them (the classic Q17 rewrite)
    val liBrand = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).filter($"p_brand" === "Brand#3")),
        $"l_partkey" === $"p_partkey")
    val avgQty = liBrand.groupBy($"l_partkey".as("p_key"))
      .agg(((dsum($"l_quantity") / count(lit(1))) * 0.4).as("qty_limit"))
    liBrand.join(avgQty, $"l_partkey" === $"p_key")
      .filter($"l_quantity" < $"qty_limit")
      .agg((dsum($"l_extendedprice") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  /** Large-volume customers (TPC-H Q18 shape): orders whose total
    * quantity exceeds a threshold — aggregate, HAVING-filter, then
    * join back to the dimensions for reporting.
    */
  def q18LargeVolume(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bigOrders = Tables.lineitem(s, dir)
      .groupBy($"l_orderkey".as("big_okey"))
      .agg(dsum($"l_quantity").as("total_qty"))
      .filter($"total_qty" > 150.0)
    Tables.orders(s, dir)
      .join(bigOrders, $"o_orderkey" === $"big_okey")
      .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"o_orderkey",
        $"o_orderdate".cast("date").as("order_date"),
        $"o_totalprice", $"total_qty")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(50)
  }

  /** Minimum-cost supplier (TPC-H Q2 shape): for each SMALL-type part,
    * the EUROPE supplier(s) selling it cheapest. The correlated MIN
    * subquery is decorrelated the way Catalyst would: aggregate
    * per (part, supplier), re-aggregate per part, join back on
    * (part, min-value). The join-back equality runs on exact DECIMAL
    * (a double would tie-break differently per engine); only the
    * reported column is cast to double. Scales: both aggregations
    * share the l_partkey shuffle key, dims broadcast.
    */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val eurSupp = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir), $"s_nationkey" === $"n_nationkey")
      .join(Tables.region(s, dir).filter($"r_name" === "EUROPE"),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_name", $"n_name")
    val smallParts = Tables.part(s, dir).filter($"p_type" === "SMALL")
      .select($"p_partkey", $"p_name")
    // offers from European suppliers for SMALL parts only — prune both
    // dims BEFORE the per-(part,supplier) aggregation
    val offers = Tables.lineitem(s, dir)
      .join(broadcast(eurSupp), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(smallParts), $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey", $"l_suppkey", $"s_name", $"n_name", $"p_name")
      .agg(min(dec($"l_extendedprice") * (dec(lit(1)) - dec($"l_discount")))
        .as("cost_dec"))
    val minCost = offers.groupBy($"l_partkey".as("mc_partkey"))
      .agg(min($"cost_dec").as("min_cost"))
    offers.join(minCost,
        $"l_partkey" === $"mc_partkey" && $"cost_dec" === $"min_cost")
      .select($"l_partkey".as("p_partkey"), $"p_name", $"s_name", $"n_name",
        $"cost_dec".cast("double").as("min_cost"))
      .orderBy($"p_partkey", $"s_name")
      .limit(100)
  }

  /** Product-type profit (TPC-H Q9 shape): nation × year profit for
    * parts matching a name pattern. LIKE filter prunes part before the
    * fact joins (broadcast); profit mixes two exact-decimal terms of
    * different scales (revenue minus imputed cost) so partial-agg order
    * can't perturb the double. Five-way join: lineitem shuffles once on
    * l_orderkey for orders; part/supplier/nation broadcast.
    */
  def q9ProductProfit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val redParts = Tables.part(s, dir).filter($"p_name".like("%red%"))
      .select($"p_partkey", $"p_retailprice")
    val suppNation = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("nation"))
    Tables.lineitem(s, dir)
      .join(broadcast(redParts), $"l_partkey" === $"p_partkey")
      .join(broadcast(suppNation), $"l_suppkey" === $"s_suppkey")
      .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .groupBy($"nation", year($"o_orderdate").cast("int").as("o_year"))
      .agg(sum(dec($"l_extendedprice") * (dec(lit(1)) - dec($"l_discount"))
          - dec($"l_quantity") * dec($"p_retailprice") * dec(lit(0.1)))
        .cast("double").as("profit"))
      .orderBy($"nation", $"o_year".desc)
  }

  /** Top supplier (TPC-H Q15 shape): supplier(s) whose quarterly
    * revenue equals the maximum — a scalar subquery OVER an aggregated
    * view. The revenue view aggregates once; its 1-row max broadcasts
    * back as an equi-join on the exact DECIMAL value (ties keep every
    * maximal supplier, same rule both engines apply).
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val revenue = Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= ts("1996-01-01 00:00:00") &&
        $"l_shipdate" < ts("1996-04-01 00:00:00"))
      .groupBy($"l_suppkey")
      .agg(sum(dec($"l_extendedprice") * (dec(lit(1)) - dec($"l_discount")))
        .as("rev_dec"))
    val maxRev = revenue.agg(max($"rev_dec").as("max_rev"))
    revenue.join(broadcast(maxRev), $"rev_dec" === $"max_rev")
      .join(broadcast(Tables.supplier(s, dir)), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name",
        $"rev_dec".cast("double").as("total_revenue"))
      .orderBy($"s_suppkey")
  }

  /** Global sales opportunity (TPC-H Q22 shape): well-funded customers
    * in target country codes with no urgent orders. Combines a
    * substring-derived grouping key, a scalar AVG subquery as the
    * balance threshold, and a null-safe anti join to the fact. The
    * customer table is filtered map-side by code before either the
    * 1-row threshold broadcast or the anti join touch it.
    */
  def q22GlobalSales(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // last two digits of the zero-padded customer number play the role
    // of Q22's phone country code
    val coded = Tables.customer(s, dir)
      .withColumn("cntrycode", substring($"c_name", 17, 2))
      .filter($"cntrycode".isin("01", "06", "13", "17", "23", "29", "31",
        "42", "55", "64", "78", "83", "90", "97"))
    val threshold = coded.filter($"c_acctbal" > 0.0)
      .agg((dsum($"c_acctbal") / count(lit(1))).as("avg_bal"))
    coded.join(broadcast(threshold))
      .filter($"c_acctbal" > $"avg_bal")
      .join(Tables.orders(s, dir).filter($"o_orderpriority" === "1-URGENT"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"cntrycode")
      .agg(count(lit(1)).as("numcust"), dsum($"c_acctbal").as("totacctbal"))
      .orderBy($"cntrycode")
  }

  /** Co-located (bucketed) join: both sides land as bucketed tables on
    * the join key, so the fact⋈fact join runs with ZERO exchange —
    * bucket i of lineitem joins bucket i of orders in place. This is
    * the canonical 100 TB shuffle elimination: the one-time bucketed
    * write is amortized over every subsequent join on the key, and the
    * per-bucket sort feeds the merge join without a sort stage. The
    * query measures the whole demo honestly (write + join); the plan
    * audit asserts the join subtree is exchange-free.
    */
  def qBucketedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bucketedPair(s, dir)
    val (liT, ordT) = bucketedNames(dir)
    // MERGE hint: at test SF the planner would broadcast tiny orders,
    // hiding the exchange-free co-located join this layout exists for;
    // at 100 TB fact⋈fact is never broadcastable, so SMJ is THE plan.
    s.table(liT).hint("merge").join(s.table(ordT), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(sum(dec($"l_extendedprice") * (dec(lit(1)) - dec($"l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"o_orderpriority")
  }

  /** Deterministic per-sfDir table names: Bench runs the query twice in
    * one session (overwrite, not collide); stale same-name tables from
    * a previous JVM aren't in the in-memory catalog, and the explicit
    * external path keeps the data out of the warehouse dir.
    */
  private[graft] def bucketedNames(dir: String): (String, String) = {
    val sfx = (dir.hashCode & 0x7fffffff).toString
    (s"graft_li_bkt_$sfx", s"graft_ord_bkt_$sfx")
  }

  private[graft] def bucketedPair(s: SparkSession, dir: String): Unit = {
    import s.implicits._
    val (liT, ordT) = bucketedNames(dir)
    val base = s"${sys.props("java.io.tmpdir")}/graft-bucketed"
    graft.sources.Sources.writeBucketed(
      Tables.lineitem(s, dir).select($"l_orderkey", $"l_extendedprice", $"l_discount"),
      liT, "l_orderkey", buckets = 8, path = Some(s"$base/$liT"))
    graft.sources.Sources.writeBucketed(
      Tables.orders(s, dir).select($"o_orderkey", $"o_orderpriority"),
      ordT, "o_orderkey", buckets = 8, path = Some(s"$base/$ordT"))
  }

  /** Shipping-lag priority check (TPC-H Q12 shape; this schema has no
    * commitdate/shipmode, so "late" = shipped >90 days after the order
    * date and the class split is the order priority). Join + dual
    * conditional counts; the lag predicate uses exact timestamp
    * arithmetic so both engines agree bit-for-bit.
    */
  def q12LateLines(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val high = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"))
      .groupBy(year($"l_shipdate").cast("int").as("ship_year"))
      .agg(count(when(high, 1)).as("high_line_count"),
        count(when(!high, 1)).as("low_line_count"))
      .orderBy($"ship_year")
  }

  /** Supplier variety per part family (TPC-H Q16 shape): distinct
    * suppliers that actually shipped each (brand, size) family,
    * excluding a supplier blacklist (negative balance stands in for
    * the complaints subquery). Anti-join the tiny blacklist BEFORE the
    * part join, then one distinct-aggregate — the blacklist prunes the
    * fact scan map-side (broadcast anti), never after the blowup.
    */
  def q16SupplierVariety(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blacklist = Tables.supplier(s, dir).filter($"s_acctbal" < 0)
      .select($"s_suppkey")
    Tables.lineitem(s, dir)
      .join(broadcast(blacklist), $"l_suppkey" === $"s_suppkey", "left_anti")
      .join(broadcast(Tables.part(s, dir)
          .filter($"p_brand" =!= "Brand#1" && $"p_size" <= 20)),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_size")
  }

  /** Dominant-supplier detection (TPC-H Q20 shape, reshaped: no
    * partsupp table, so "excess stock" becomes a supplier shipping
    * more than half of a part's 1997 volume). Two aggregates at
    * different granularity over ONE scan, the finer reused for the
    * coarser; the dominance test (>90% of a multi-supplier part's
    * volume) is exact decimal — engines can't disagree on ties; semi-
    * join back to supplier.
    */
  def q20ExcessStock(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val shipped97 = Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= ts("1997-01-01 00:00:00") &&
        $"l_shipdate" < ts("1998-01-01 00:00:00"))
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum(dec($"l_quantity")).as("q"))
    val partTotals = shipped97.groupBy($"l_partkey")
      .agg(sum($"q").as("tot"), count(lit(1)).as("n_supp"))
    val dominant = shipped97.join(partTotals, "l_partkey")
      .filter($"n_supp" >= 2 && $"q" * 10 > $"tot" * 9)
      .select($"l_suppkey").distinct()
    Tables.supplier(s, dir)
      .join(dominant, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name", $"s_acctbal")
      .orderBy($"s_suppkey")
  }

  /** Waiting-supplier blame (TPC-H Q21 shape): in finished multi-
    * supplier orders, the supplier whose line shipped strictly last —
    * EXISTS (another supplier in the order) ∧ NOT EXISTS (a later-
    * shipping other supplier) as semi + anti joins with inequality
    * residuals on the SAME fact: all three legs shuffle once on
    * l_orderkey and co-locate.
    */
  def q21WaitingSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
    val l2 = li.select($"l_orderkey".as("k2"), $"l_suppkey".as("s2"))
    val l3 = li.select($"l_orderkey".as("k3"), $"l_suppkey".as("s3"),
      $"l_shipdate".as("d3"))
    li.join(Tables.orders(s, dir).filter($"o_orderstatus" === "F"),
        $"l_orderkey" === $"o_orderkey", "left_semi")
      .join(l2, $"l_orderkey" === $"k2" && $"l_suppkey" =!= $"s2", "left_semi")
      .join(l3, $"l_orderkey" === $"k3" && $"l_suppkey" =!= $"s3" &&
        $"d3" > $"l_shipdate", "left_anti")
      .join(broadcast(Tables.supplier(s, dir)),
        $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
  }

  /** Important stock (TPC-H Q11 shape, partsupp played by lineitem):
    * per-part value of the lines supplied by one nation's suppliers,
    * kept only where the part's share exceeds a fraction of the
    * nation-wide total. The supplier dim filters map-side via
    * broadcast; the per-part aggregate is computed ONCE and reused for
    * both the scalar total (1-row broadcast) and the threshold filter —
    * at 100 TB the fact is scanned a single time, and the second pass
    * runs over the already-aggregated per-part rows only.
    */
  def q11ImportantStock(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // a key-range "region" of nations rather than one name: present at
    // every SF (sf0.001 has only 10 suppliers over sparse nations)
    val natSupp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir).filter($"n_nationkey" < 8)),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    // persisted: the per-part aggregate feeds both the scalar threshold
    // and the filter — without it the fact scan would run twice
    val perPart = graft.ops.Dedup.tracked(Tables.lineitem(s, dir)
      .join(broadcast(natSupp), $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_partkey")
      .agg(sum(dec($"l_extendedprice") * (dec(lit(1)) - dec($"l_discount")))
        .as("val_dec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // TPC-H Q11 scales its share threshold inversely with table size;
    // the equivalent here: parts above 2× the MEAN part value, which
    // stays meaningful (and non-empty) at every SF
    val total = perPart.agg(sum($"val_dec").as("total_dec"),
      count(lit(1)).as("n_parts"))
    perPart.join(broadcast(total))
      .filter($"val_dec".cast("double") >
        $"total_dec".cast("double") / $"n_parts" * 2)
      .select($"l_partkey", $"val_dec".cast("double").as("part_value"))
      .orderBy($"part_value".desc, $"l_partkey")
  }

  /** One-pass data profiling: the table-shape summary (row counts,
    * cardinalities, null counts, ranges) a pipeline runs before
    * choosing partitioning and filter thresholds. Everything folds
    * into a single aggregate over one scan — no per-column passes; the
    * distinct counts are the only shuffle-expensive part and they
    * share the same scan.
    */
  def qProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // THREE countDistincts in one aggregate force an Expand: every
    // fact row is replicated ×4 (one replica per distinct set + one
    // for the plain aggregates) through the first exchange, keyed on
    // the 3-column distinct tuple. Split instead into one plain
    // single-pass aggregate plus one single-distinct aggregate per
    // column: each plans Expand-free over a scan pruned to its one
    // column, with map-side partial dedup before the shuffle (guide
    // §2.3/§6; r15 Expand purge). The cross joins combine four 1-row
    // results — same values, same schema, same order.
    val li = Tables.lineitem(s, dir)
    val base = li.agg(
      count(lit(1)).as("n_rows"),
      sum(when($"l_returnflag".isNull, 1L).otherwise(0L)).as("n_null_flag"),
      min($"l_quantity").as("min_qty"),
      max($"l_quantity").as("max_qty"),
      (dsum($"l_quantity") / count(lit(1))).as("avg_qty"),
      min($"l_shipdate").cast("date").as("min_shipdate"),
      max($"l_shipdate").cast("date").as("max_shipdate"))
    base
      .crossJoin(li.agg(countDistinct($"l_orderkey").as("n_orders")))
      .crossJoin(li.agg(countDistinct($"l_partkey").as("n_parts")))
      .crossJoin(li.agg(countDistinct($"l_suppkey").as("n_suppliers")))
      .select($"n_rows", $"n_orders", $"n_parts", $"n_suppliers",
        $"n_null_flag", $"min_qty", $"max_qty", $"avg_qty",
        $"min_shipdate", $"max_shipdate")
  }

  /** Navigation windows: first/last/nth order value per customer over
    * the full partition frame — the "compare each row to its group's
    * anchor rows" shape (no self-join; one window shuffle).
    */
  def qWindowFirsts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .filter($"o_custkey" <= 50)
      .select($"o_custkey", $"o_orderkey",
        $"o_orderdate".cast("date").as("order_date"), $"o_totalprice",
        first($"o_totalprice").over(w).as("first_price"),
        last($"o_totalprice").over(w).as("last_price"),
        nth_value($"o_totalprice", 2).over(w).as("second_price"))
      .orderBy($"o_custkey", $"order_date", $"o_orderkey")
  }

  /** Window lag/lead: per-customer order value deltas over time. */
  def qLagLead(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(s, dir)
      .filter($"o_custkey" <= 50)
      .withColumn("prev_price", lag($"o_totalprice", 1).over(w))
      .withColumn("next_price", lead($"o_totalprice", 1).over(w))
      .select($"o_custkey", $"o_orderkey",
        $"o_orderdate".cast("date").as("order_date"),
        $"o_totalprice", $"prev_price", $"next_price")
      .orderBy($"o_custkey", $"order_date", $"o_orderkey")
  }

  /** Ordered string aggregation (LISTAGG/string_agg): nations per
    * region as one sorted CSV — `sort_array(collect_list)` is the
    * deterministic Spark idiom (collect order is partition-dependent;
    * the sort pins it, matching the oracle's WITHIN-GROUP order).
    */
  def qStringAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.region(s, dir)
      .join(Tables.nation(s, dir), $"r_regionkey" === $"n_regionkey")
      .groupBy($"r_name")
      .agg(concat_ws(",", sort_array(collect_list($"n_name"))).as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy($"r_name")
  }

  /** Rank-statistic windows in one pass: rank, dense_rank,
    * percent_rank, cume_dist over a composite (unique) order — the
    * doubles are (rank−1)/(n−1) and rows≤/n from identical integers in
    * both engines, so they hash exactly.
    */
  def qRankStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice", $"o_orderkey")
    Tables.orders(s, dir)
      .filter($"o_custkey" <= 20)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice",
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** Left-semi join (SQL EXISTS): market segments counted by customers
    * with at least one urgent order. The semi join stops probing at the
    * first match and never widens rows with build-side columns — at
    * scale that's strictly cheaper than inner-join + distinct; the
    * filtered orders side builds the (broadcastable) hash table.
    */
  def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val urgent = Tables.orders(s, dir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey")
    Tables.customer(s, dir)
      .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_cust"))
      .orderBy($"c_mktsegment")
  }
}
