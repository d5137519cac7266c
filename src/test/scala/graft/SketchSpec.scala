package graft

import graft.functions.SketchFunctions
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  private def sketchCounts(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.agg(SketchFunctions.freq_items(col("item"), k).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("freq_items is exact when distinct items fit in k") {
    import spark.implicits._
    val data = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(5)("c")
    val df = scala.util.Random.shuffle(data).toDF("item").repartition(8)
    val got = sketchCounts(df, k = 4)
    assert(got == Map("a" -> 40L, "b" -> 25L, "c" -> 5L))
  }

  test("freq_items honors the Misra-Gries guarantee past capacity, across partitions") {
    import spark.implicits._
    val r = new scala.util.Random(7)
    // 3 planted heavy hitters + a long tail of 200 distinct light items
    val heavy = Seq.fill(500)("hot1") ++ Seq.fill(400)("hot2") ++ Seq.fill(300)("hot3")
    val tail = Seq.fill(800)(s"cold${r.nextInt(200)}")
    val data = r.shuffle(heavy ++ tail)
    val n = data.size
    val k = 16
    val df = data.toDF("item").repartition(8)
    val got = sketchCounts(df, k)
    val exact = data.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
    assert(got.size <= k, s"sketch kept ${got.size} > k=$k counters")
    // every item above the n/(k+1) threshold must be present
    val threshold = n.toDouble / (k + 1)
    for ((item, c) <- exact if c > threshold)
      assert(got.contains(item), s"$item (count $c > $threshold) missing from sketch")
    // estimates never exceed the true count and err at most n/(k+1)
    for ((item, est) <- got) {
      val truth = exact(item)
      assert(est <= truth, s"$item overestimated: $est > $truth")
      assert(est >= truth - threshold - 1,
        s"$item underestimated beyond the bound: $est vs $truth")
    }
  }

  test("freq_items: nulls skipped, empty input yields empty sketch") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("a"), None).toDF("item")
    val got = sketchCounts(df, k = 4)
    assert(got == Map("a" -> 2L))
    val empty = sketchCounts(Seq.empty[String].toDF("item"), k = 4)
    assert(empty.isEmpty)
  }

  test("q_heavy_hitters matches the exact per-segment counts") {
    import spark.implicits._
    val got = graft.queries.Events.heavyHitters(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy(($"user_id" % 10).as("segment"), $"event_type")
      .count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == exact)
  }

  private def sketchQuantiles(df: org.apache.spark.sql.DataFrame,
      ps: Seq[Double], cap: Int): Seq[Double] =
    df.agg(SketchFunctions.quantile_sketch(col("v"), ps, cap).as("q"))
      .collect()(0).getSeq[Double](0)

  test("quantile_sketch is exact (percentile-identical) under capacity") {
    import spark.implicits._
    val r = new scala.util.Random(11)
    val vals = Seq.fill(5000)(r.nextInt(1000).toDouble)
    val df = vals.toDF("v").repartition(8) // partials must merge losslessly
    val ps = Seq(0.25, 0.5, 0.75, 0.9)
    val got = sketchQuantiles(df, ps, cap = 1 << 13)
    val exact = df.agg(expr("percentile(v, array(0.25, 0.5, 0.75, 0.9))"))
      .collect()(0).getSeq[Double](0)
    assert(got == exact, s"$got vs $exact")
  }

  test("quantile_sketch error stays bounded at large n/capacity (direct drive)") {
    // n/capacity ≈ 244 — the regime where a fixed keep-upper compaction
    // phase drifts past 3% rank error (review finding); the alternating
    // phase must hold the line. Driven without Spark: the aggregate's
    // buffer ops are plain JVM calls, so 1M updates are fast.
    import graft.functions.QuantileSketch
    import org.apache.spark.sql.catalyst.expressions.Literal
    val n = 1000000
    val cap = 4096
    val qs = QuantileSketch(Literal(0.0), Seq(0.1, 0.5, 0.9), cap)
    val r = new scala.util.Random(17)
    val vals = Array.fill(n)(r.nextDouble())
    // simulate 16 map-side partials merged like Spark would
    val parts = vals.grouped(n / 16).map { chunk =>
      val b = qs.createAggregationBuffer()
      chunk.foreach(v => qs.add(b, v, 1L))
      b
    }.toSeq
    val merged = parts.reduce((a, b) => qs.merge(a, b))
    val est = qs.eval(merged)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
    val sorted = vals.sorted
    Seq(0.1, 0.5, 0.9).zip(est).foreach { case (p, e) =>
      val rank = sorted.count(_ <= e)
      val err = math.abs(rank - p * n) / n.toDouble
      assert(err < 0.02, s"p=$p est=$e rank error $err")
    }
  }

  test("quantile_sketch rank error bounded past capacity") {
    import spark.implicits._
    val n = 100000
    val r = new scala.util.Random(13)
    val vals = Array.fill(n)(r.nextDouble() * 1e6)
    val df = vals.toSeq.toDF("v").repartition(16)
    val ps = Seq(0.1, 0.5, 0.9)
    val got = sketchQuantiles(df, ps, cap = 4096)
    val sorted = vals.sorted
    ps.zip(got).foreach { case (p, est) =>
      // empirical rank of the estimate vs target rank
      val rank = sorted.count(_ <= est)
      val err = math.abs(rank - p * n) / n.toDouble
      assert(err < 0.03, s"p=$p est=$est rank error $err")
    }
  }

  test("distinct_sketch is exact below the threshold, across partitions") {
    import spark.implicits._
    val r = new scala.util.Random(23)
    // 1200 distinct values with heavy duplication, split over 2 groups
    val data = Seq.fill(20000)((r.nextInt(2), s"u${r.nextInt(1200)}"))
    val df = data.toDF("g", "item").repartition(16)
    val got = df.groupBy("g")
      .agg(SketchFunctions.distinct_sketch(col("item"), exactThreshold = 4096)
        .as("d"))
      .collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
    val exact = data.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._2).distinct.size.toLong
    }
    assert(got == exact)
    // nulls skipped; empty group absent, all-null group counts 0
    val withNull = Seq((1, Some("a")), (1, None), (2, None)).toDF("g", "item")
    val nd = withNull.groupBy("g")
      .agg(SketchFunctions.distinct_sketch(col("item")).as("d"))
      .collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
    assert(nd == Map(1 -> 1L, 2 -> 0L))
  }

  test("distinct_sketch HLL error bounded at 200k distinct (direct drive)") {
    import graft.functions.DistinctSketch
    import org.apache.spark.sql.catalyst.expressions.Literal
    val ds = DistinctSketch(Literal(""), p = 12, exactThreshold = 1024)
    val n = 200000
    val parts = (0 until 16).map { shard =>
      val b = ds.createAggregationBuffer()
      var i = shard
      while (i < n) { ds.merge(b, serde(ds, s"user-$i")); i += 16 }
      b
    }
    // merge-order independence: register max is associative+commutative
    val fwd = parts.reduce((a, b) => ds.merge(a, b))
    val est = ds.eval(fwd).asInstanceOf[Long]
    val rel = math.abs(est - n).toDouble / n
    // sigma ≈ 1.04/sqrt(4096) ≈ 1.6%; allow 3 sigma
    assert(rel < 0.05, s"estimate $est vs $n: relative error $rel")
  }

  test("distinct_sketch dense estimate is merge-order independent") {
    import graft.functions.DistinctSketch
    import org.apache.spark.sql.catalyst.expressions.Literal
    val ds = DistinctSketch(Literal(""), p = 12, exactThreshold = 64)
    def shard(lo: Int, hi: Int) = {
      val b = ds.createAggregationBuffer()
      (lo until hi).foreach(i => ds.merge(b, serde(ds, s"v$i")))
      b
    }
    val a = () => shard(0, 5000); val b = () => shard(3000, 9000)
    val c = () => shard(8000, 12000)
    val e1 = ds.eval(ds.merge(ds.merge(a(), b()), c())).asInstanceOf[Long]
    val e2 = ds.eval(ds.merge(ds.merge(c(), a()), b())).asInstanceOf[Long]
    assert(e1 == e2, s"merge order changed the estimate: $e1 vs $e2")
    // and a sparse shard folds into a dense one on either side
    val sparse = {
      val bb = ds.createAggregationBuffer()
      (0 until 10).foreach(i => ds.merge(bb, serde(ds, s"v$i")))
      bb
    }
    val e3 = ds.eval(ds.merge(shard(0, 5000), sparse)).asInstanceOf[Long]
    assert(e3 == ds.eval(shard(0, 5000)).asInstanceOf[Long],
      "duplicate sparse values must not move a dense estimate")
  }

  /** One-value buffer, round-tripped through serialize/deserialize the
    * way Spark ships map-side partials.
    */
  private def serde(ds: graft.functions.DistinctSketch, v: String) = {
    val b = ds.createAggregationBuffer()
    ds.offerValue(b, v)
    ds.deserialize(ds.serialize(b))
  }

  test("distinct_state + distinct_merge: rollup of states equals the one-shot sketch") {
    import spark.implicits._
    import graft.functions.SketchFunctions._
    val r = new scala.util.Random(5)
    val rows = (0 until 3000).map(i => (i % 7, s"u${r.nextInt(800)}"))
    val df = rows.toDF("bucket", "user").repartition(8).persist()
    // two-level: per-bucket states, merged to one overall estimate
    val merged = df.groupBy(col("bucket"))
      .agg(distinct_state(col("user"), exactThreshold = 64).as("st"))
      .agg(distinct_merge(col("st"), exactThreshold = 64).as("n"))
      .head().getLong(0)
    // one-shot over the same rows (dense path: 800 distinct > 64)
    val oneShot = df.agg(
      graft.functions.SketchFunctions.distinct_sketch(col("user"),
        exactThreshold = 64).as("n")).head().getLong(0)
    assert(merged == oneShot,
      s"state rollup must equal the one-shot sketch: $merged vs $oneShot")
    // sparse regime: states stay exact sets, merge is exact
    val exact = df.filter(col("bucket") < 2)
      .groupBy(col("bucket"))
      .agg(distinct_state(col("user"), exactThreshold = 8192).as("st"))
      .agg(distinct_merge(col("st"), exactThreshold = 8192).as("n"))
      .head().getLong(0)
    val truth = df.filter(col("bucket") < 2)
      .select("user").distinct().count()
    assert(exact == truth, s"sparse merge must be exact: $exact vs $truth")
    df.unpersist()
  }

  test("count_min is exact when distinct items are sparse in the grid") {
    import spark.implicits._
    import graft.functions.SketchFunctions._
    val data = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(5)("c")
    val df = scala.util.Random.shuffle(data).toDF("item").repartition(8)
      .agg(count_min(col("item"), depth = 4, width = 256).as("sk"))
    val got = Seq("a", "b", "c").map { it =>
      it -> df.select(cms_estimate(col("sk"), lit(it), 4, 256)).head().getLong(0)
    }.toMap
    assert(got == Map("a" -> 40L, "b" -> 25L, "c" -> 5L))
  }

  test("count_min never undercounts and honors the e/width error bound") {
    import spark.implicits._
    import graft.functions.SketchFunctions._
    val r = new scala.util.Random(11)
    // zipf-ish: item i has frequency ~ 2000/(i+1), 500 distinct >> width 64
    val data = (0 until 500).flatMap(i => Seq.fill(2000 / (i + 1) + 1)(s"it$i"))
    val n = data.size
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val (depth, width) = (4, 64)
    val sk = r.shuffle(data).toDF("item").repartition(16)
      .agg(count_min(col("item"), depth, width).as("sk")).persist()
    // every estimate >= truth; overcount within 2·(e/width)·N for the
    // hot head (the classic per-query bound holds w.h.p.; the factor-2
    // margin absorbs the fixed hash family's luck)
    val bound = 2.0 * math.E / width * n
    truth.toSeq.sortBy(-_._2).take(50).foreach { case (item, t) =>
      val est = sk.select(cms_estimate(col("sk"), lit(item), depth, width))
        .head().getLong(0)
      assert(est >= t, s"$item undercounted: $est < $t")
      assert(est - t <= bound, s"$item overcounted: $est vs $t (bound $bound)")
    }
    sk.unpersist()
  }

  test("count_min merge is element-wise addition: order-independent and lossless") {
    val agg = graft.functions.CountMinAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 4, 64)
    def shard(items: Seq[String]) = {
      val b = agg.createAggregationBuffer()
      items.foreach { it =>
        val h = graft.functions.Cms.hash64(it.getBytes("UTF-8"))
        (0 until 4).foreach(j => b(j * 64 + graft.functions.Cms.index(h, j, 64)) += 1L)
      }
      agg.deserialize(agg.serialize(b))
    }
    val parts = Seq(shard((0 until 100).map(i => s"a$i")),
      shard((0 until 50).map(i => s"b$i")), shard(Seq.fill(30)("hot")))
    val m1 = parts.map(_.clone()).reduce(agg.merge)
    val m2 = parts.reverse.map(_.clone()).reduce(agg.merge)
    assert(m1.toSeq == m2.toSeq, "merge order changed the sketch")
    assert(m1.sum == 4L * (100 + 50 + 30), "merged mass must equal input mass")
  }
}
