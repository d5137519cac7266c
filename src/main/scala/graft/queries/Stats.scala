package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical / analytic queries that complete the "profiling a 100 TB
  * table" story: correlation & regression, distribution entropy, Pareto
  * (skyline) frontiers, interval-concurrency sweeps, rolling distinct
  * users. All doubles derive from exact integer/decimal aggregates so
  * both engines produce bit-identical values (see Relational scaladoc
  * for the technique; `text_unigram_logprob` established the
  * floor-quantized-log pattern).
  */
object Stats {

  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Pearson correlation + least-squares slope/intercept of
    * (l_quantity, l_extendedprice) per return flag. The five moment
    * sums (Σx, Σy, Σxy, Σx², Σy²) are exact DECIMAL aggregates — one
    * map-side-combinable pass over the fact, O(groups) result — and the
    * correlation/slope doubles are derived from them with an expression
    * tree the oracle mirrors token-for-token, so the floats
    * hash-match. At 100 TB this is the cheapest possible shape: no
    * second pass, no centered residuals, just partial-aggregated sums.
    */
  def qCorrStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(dec($"l_quantity")).cast("double").as("sx"),
        sum(dec($"l_extendedprice")).cast("double").as("sy"),
        sum(dec($"l_quantity") * dec($"l_extendedprice")).cast("double").as("sxy"),
        sum(dec($"l_quantity") * dec($"l_quantity")).cast("double").as("sxx"),
        sum(dec($"l_extendedprice") * dec($"l_extendedprice")).cast("double").as("syy"))
    val cov = $"n" * $"sxy" - $"sx" * $"sy"
    val vx = $"n" * $"sxx" - $"sx" * $"sx"
    val vy = $"n" * $"syy" - $"sy" * $"sy"
    val slope = cov / vx
    // rounded to absorb the one-ulp a·b−c·d difference between Java's
    // strict doubles and DuckDB's FMA-contracted build (same precedent
    // as the ANN cosine's 6-dp rounding)
    m.select($"l_returnflag", $"n",
        round(cov / (sqrt(vx) * sqrt(vy)), 12).as("corr"),
        round(slope, 9).as("slope"),
        round(($"sy" - slope * $"sx") / $"n", 6).as("intercept"))
      .orderBy($"l_returnflag")
  }

  /** Shannon entropy of each source's language distribution. Per-lang
    * counts come from one aggregate; each count contributes
    * c·⌊1e6·ln(n/c)⌋ in integer micro-nats, so the per-source sum is
    * exact integer math (order-independent across partitions and
    * engines) and only the final normalization is a double. The same
    * quantization trick as `text_unigram_logprob`.
    */
  def qEntropy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"source")
    Tables.documents(s, dir)
      .groupBy($"source", $"lang").agg(count(lit(1)).as("c"))
      .withColumn("n", sum($"c").over(w))
      .select($"source", $"n", $"c",
        ($"c" * floor(log($"n".cast("double") / $"c") * 1e6)).as("term"))
      .groupBy($"source")
      .agg(max($"n").as("n_docs"), count(lit(1)).as("n_langs"),
        sum($"term").as("sq"))
      .select($"source", $"n_docs", $"n_langs",
        ($"sq".cast("double") / ($"n_docs" * 1e6)).as("entropy_nats"))
      .orderBy($"source")
  }

  /** 2-D skyline (Pareto frontier): parts not dominated on
    * (retailprice, size) — no other part is ≤ on both and < on one.
    * Two-phase distributed plan: (1) a partition-local prune — within
    * any partition, a point dominated by a co-resident point is
    * dominated globally, so each partition keeps only its local
    * frontier via one sorted cumulative-min pass; (2) the few
    * survivors (≈ #partitions × frontier size) take a single-partition
    * pass with the same cumulative-min rule. Never the O(n²)
    * dominance self-join the naive formulation implies — that is what
    * the oracle computes.
    */
  def qSkyline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // On distinct points sorted by (x asc, y asc), a point is dominated
    // iff min(y) over its strict predecessors is ≤ its own y.
    def prune(df: DataFrame, part: Column): DataFrame = {
      val w = Window.partitionBy(part).orderBy($"x", $"y")
        .rowsBetween(Window.unboundedPreceding, -1)
      df.withColumn("cm", min($"y").over(w))
        .filter($"cm".isNull || $"cm" > $"y")
        .drop("cm")
    }
    val pts = Tables.part(s, dir)
      .select(dec($"p_retailprice").as("x"), $"p_size".cast("long").as("y"))
      .distinct()
    val local = prune(pts.withColumn("pid", spark_partition_id()), $"pid")
      .drop("pid")
    prune(local, lit(0))
      .select($"x".cast("double").as("price"), $"y".as("size"))
      .orderBy($"price", $"size")
  }

  /** Interval-concurrency sweep: each order opens a 30-day fulfillment
    * window; per priority class, the maximum number of simultaneously
    * open orders and when that peak is first reached. The classic
    * sweep-line recast as one aggregation + one window pass: ±1
    * boundary events are NETTED per (priority, timestamp) first, so the
    * running sum is deterministic under ties and the shuffle carries
    * O(distinct timestamps), not O(orders). Never expands
    * interval×interval pairs.
    */
  def qIntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val bounds = o.select($"o_orderpriority".as("prio"), $"o_orderdate".as("t"),
        lit(1L).as("d"))
      .unionAll(o.select($"o_orderpriority".as("prio"),
        ($"o_orderdate" + expr("INTERVAL '30' DAY")).as("t"), lit(-1L).as("d")))
    val net = bounds.groupBy($"prio", $"t").agg(sum($"d").as("net"))
    val run = Window.partitionBy($"prio").orderBy($"t")
      .rowsBetween(Window.unboundedPreceding, 0)
    val seg = net.withColumn("cum", sum($"net").over(run))
      .withColumn("peak", max($"cum").over(Window.partitionBy($"prio")))
    seg.filter($"cum" === $"peak")
      .groupBy($"prio")
      .agg(max($"peak").as("peak"), min($"t").as("peak_from"))
      .orderBy($"prio")
  }

  /** Statistical mode (most frequent l_quantity per return flag,
    * smallest value on ties). Two stacked aggregations — value counts,
    * then ONE arg-max per group via an ordered struct max — so the
    * plan is two map-side-combinable shuffles and no window sort at
    * all: at 100 TB the window formulation sorts every (group, value)
    * partition; the struct-max carries 16 bytes per group.
    */
  def qMode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag", $"l_quantity").agg(count(lit(1)).as("cnt"))
      // max of (cnt, -qty) = highest count, smallest quantity on ties
      .groupBy($"l_returnflag")
      .agg(max(struct($"cnt", (-$"l_quantity").as("nq"))).as("m"))
      .select($"l_returnflag", (-$"m.nq").as("mode_qty"), $"m.cnt".as("n_mode"))
      .orderBy($"l_returnflag")
  }

  /** Lag cross-correlation of two event series ("do clicks lead
    * purchases?"): daily counts per type come from ONE aggregate over
    * the raw scan; the ±3-day lag sweep then runs entirely on the
    * tiny aggregated series (map-side ×7 lag expansion + a join on
    * the shifted day) — the raw events are never re-scanned per lag.
    * Correlations derive from exact integer sums, rounded like
    * `q_corr_stats`.
    */
  def qXcorr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, dir)
      .groupBy(date_trunc("day", $"ts").as("day"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val c = daily.filter($"event_type" === "click")
      .select($"day".as("cday"), $"n".as("x"))
    val p = daily.filter($"event_type" === "purchase")
      .select($"day".as("pday"), $"n".as("y"))
    val shifted = c
      .select(explode(sequence(lit(-3L), lit(3L))).as("lag"), $"cday", $"x")
      .select($"lag", ($"cday" + expr("INTERVAL '1' DAY") * $"lag").as("pday"),
        $"x")
    val m = shifted.join(p, "pday")
      .groupBy($"lag")
      .agg(count(lit(1)).as("n"),
        sum($"x").cast("double").as("sx"), sum($"y").cast("double").as("sy"),
        sum($"x" * $"y").cast("double").as("sxy"),
        sum($"x" * $"x").cast("double").as("sxx"),
        sum($"y" * $"y").cast("double").as("syy"))
    val cov = $"n" * $"sxy" - $"sx" * $"sy"
    val vx = $"n" * $"sxx" - $"sx" * $"sx"
    val vy = $"n" * $"syy" - $"sy" * $"sy"
    m.select($"lag", $"n",
        round(cov / (sqrt(vx) * sqrt(vy)), 12).as("xcorr"))
      .orderBy($"lag")
  }

  /** Rolling distinct users: DAU, trailing-7-day WAU and the
    * DAU/WAU stickiness ratio per day. The scale trick: raw events
    * collapse to distinct (day, user) FIRST (one shuffle of the
    * deduped pairs), and the 7-day window is a map-side ×7 expansion
    * of those pairs — the engine never recounts raw events per window
    * offset, and no sliding-window distinct state is held anywhere.
    */
  def qRollingDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ud = graft.ops.Dedup.tracked(Tables.events(s, dir)
      .select(date_trunc("day", $"ts").as("day"), $"user_id")
      .distinct()
      .persist())
    // ud is the DISTINCT (day, user) pair set, so per-day users are
    // already unique — plain count equals countDistinct row for row
    // and drops the distinct-aggregate's extra exchange (guide §2.3)
    val dau = ud.groupBy($"day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(explode(sequence(lit(0), lit(6))).as("off"), $"day", $"user_id")
      .select(($"day" + expr("INTERVAL '1' DAY") * $"off").as("day"), $"user_id")
      .groupBy($"day").agg(countDistinct($"user_id").as("wau"))
    dau.join(wau, "day")
      .select($"day", $"dau", $"wau",
        ($"dau".cast("double") / $"wau".cast("double")).as("stickiness"))
      .orderBy($"day")
  }
}
