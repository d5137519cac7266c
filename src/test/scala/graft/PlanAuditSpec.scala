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

  test("ivf training reduction: one row per vector, no per-element explode") {
    import graft.functions.VectorFunctions
    val emb = Tables.embeddings(spark, sf)
    val centroids = Array.fill(4)(Array.fill(64)(0.1))
    val assigned = emb.select(col("embedding").cast("array<double>").as("v"),
      element_at(VectorFunctions.nearest_centroids(
        col("embedding"), centroids, 1), 1).as("cluster"))
    val stats = assigned.groupBy("cluster")
      .agg(VectorFunctions.vector_sum(col("v")).as("vsum"),
        count(lit(1)).as("n"))
    stats.collect()
    val plan = stats.queryExecution.executedPlan.toString()
    // vector-sum aggregates whole rows: no Generate (posexplode) stage,
    // and the TypedImperativeAggregate runs with map-side partials
    assert(!plan.contains("Generate"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2,
      "expected partial + final aggregation:\n" + plan)
  }

  test("custom expressions run inside WholeStageCodegen, not as fallbacks") {
    import graft.functions.{HashFunctions, VectorFunctions}
    import spark.implicits._
    // one projection exercising every converted expression family
    val docs = Tables.documents(spark, sf).limit(100)
      .select(split(lower(col("text")), "\\s+").as("toks"))
      .select(HashFunctions.ngram_hashes(col("toks"), 3, mod31 = true).as("sh"))
      .select(HashFunctions.minhash_signature(col("sh")).as("mh"),
        HashFunctions.simhash64(col("sh")).as("simh"))
    docs.collect()
    val docPlan = docs.queryExecution.executedPlan.toString()
    // the Project containing the expressions is a codegen stage ("*(n)")
    val projLine = docPlan.linesIterator
      .find(l => l.contains("minhashsignature") || l.contains("MinHashSignature"))
      .getOrElse(fail(s"no MinHashSignature node in plan:\n$docPlan"))
    // codegen stages print as "*(n) Project ..." (tree prefix may precede)
    assert(projLine.contains("*("),
      s"sketch projection not in a WholeStageCodegen span: $projLine")

    val emb = Tables.embeddings(spark, sf).limit(100)
      .select(col("embedding").as("v"))
    val cos = emb.as("a").crossJoin(emb.as("b").limit(1))
      .select(VectorFunctions.vector_cosine(
        col("a.v"), col("b.v")).as("c"))
      .filter(col("c") > -2.0)
    cos.collect()
    val cosPlan = cos.queryExecution.executedPlan.toString()
    val cosLine = cosPlan.linesIterator
      .find(l => l.toLowerCase.contains("cosinesimilarity"))
      .getOrElse(fail(s"no CosineSimilarity node in plan:\n$cosPlan"))
    assert(cosLine.contains("*("),
      s"cosine projection not in a WholeStageCodegen span: $cosLine")
  }

  test("q_token_freq: partial agg collapses the explode map-side; top-k is TakeOrdered") {
    val plan = physicalPlan(graft.queries.Text.tokenFreq(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    val exchangeIdx = plan.indexOf("Exchange")
    // a partial HashAggregate must sit below the exchange, so only one
    // row per distinct token per partition crosses the shuffle
    assert(exchangeIdx >= 0 && plan.lastIndexOf("HashAggregate") > exchangeIdx, plan)
  }

  test("q8: every dimension side joins as broadcast") {
    val plan = physicalPlan(Relational.q8MarketShare(spark, sf))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts\n$plan")
  }

  test("q_hash_split is map-only up to its single aggregation exchange") {
    val plan = physicalPlan(graft.queries.Text.hashSplit(spark, sf))
    // one exchange for the groupBy, one for the final order — the md5
    // split assignment itself must not shuffle
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges\n$plan")
  }

  test("bucketed join: fact-fact join subtree runs with zero exchange") {
    val plan = physicalPlan(Relational.qBucketedJoin(spark, sf))
    val smjIdx = plan.indexOf("SortMergeJoin")
    assert(smjIdx >= 0, s"expected a sort-merge join\n$plan")
    // tree print lists children below their parent: any Exchange after
    // the join node would be a shuffle feeding it — bucketing must
    // have eliminated both
    assert(plan.indexOf("Exchange", smjIdx) < 0,
      s"exchange below the bucketed join\n$plan")
    assert("Bucketed: true".r.findAllIn(plan).length == 2,
      s"expected both scans bucketed\n$plan")
  }

  test("partition-pruned scan reads one partition directory, not the lake") {
    val plan = physicalPlan(graft.queries.Events.partitionPruned(spark, sf))
    val pf = "PartitionFilters: \\[[^\\]]*".r.findFirstIn(plan).getOrElse("")
    assert(pf.contains("event_type"), s"no partition filter pushed\n$plan")
    // the pruning column must NOT appear as a data filter on the scan
    val readSchema = "ReadSchema:.*".r.findFirstIn(plan).getOrElse("")
    assert(!readSchema.contains("event_type"), readSchema)
  }

  test("q11: per-part aggregate cached and reused, threshold broadcast") {
    val df = Relational.q11ImportantStock(spark, sf)
    val plan = physicalPlan(df)
    // both consumers (scalar total and the filter) read the SAME
    // persisted per-part aggregate — no second fact scan
    assert("InMemoryTableScan".r.findAllIn(plan).length >= 2,
      s"per-part aggregate not reused from cache\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
    df.collect()
    graft.ops.Dedup.releaseCaches()
  }

  test("outliers: per-type stats broadcast back, no fact-fact shuffle join") {
    val plan = physicalPlan(graft.queries.Events.outliers(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("unigram logprob: LM and total are broadcast, scoring is map-side") {
    val plan = physicalPlan(graft.queries.Text.unigramLogprob(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 1, plan)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      "BroadcastHashJoin".r.findAllIn(plan).length >= 2, plan)
  }

  test("zorder query: both box predicates pushed to the clustered scan") {
    val df = graft.queries.Events.zorderPruned(spark, sf)
    val plan = physicalPlan(df)
    val pushed = "PushedFilters: \\[[^\\]]*".r.findFirstIn(plan).getOrElse("")
    assert(pushed.contains("user_id") && pushed.contains("day_idx"),
      s"box predicates not pushed: $pushed")
  }

  test("expectations metrics: ONE scan, one aggregate pair, #rules output rows") {
    val df = graft.queries.Etl.expectations(spark, sf)
    val plan = physicalPlan(df)
    val scans = "FileScan parquet".r.findAllIn(plan).length +
      "Scan parquet".r.findAllIn(plan).length
    assert(scans <= 2, s"quality report must not rescan per rule:\n$plan")
    // the only exchange is the single-row aggregate's (plus the sort)
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 3, s"too many exchanges ($exchanges):\n$plan")
  }

  test("label encode: dictionaries broadcast, fact scan never shuffles") {
    val df = graft.queries.Text.labelEncode(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the dictionary ids come from range-sort + zipWithIndex, NOT a
    // partition-less window — a high-cardinality label column must
    // encode at full parallelism instead of silently serializing
    assert(!plan.contains("WindowExec"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("chunking is map-side: no exchange below the output sort") {
    val df = graft.queries.Text.chunk(spark, sf)
    val plan = physicalPlan(df)
    // exactly the rangepartitioning exchange of the final orderBy
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"chunking must not shuffle data:\n$plan")
    assert(plan.contains("rangepartitioning"), plan)
  }

  test("pagerank: per-iteration plans stay O(1) deep via checkpoints") {
    import spark.implicits._
    val edges = Seq.tabulate(200)(i => (i.toLong % 40, (i * 7 % 40).toLong))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val pr = graft.ops.PageRank.run(edges, iters = 5)
    // after 5 rounds the plan must reference the checkpointed RDD, not
    // 5 nested joins — lineage truncation is what survives iteration
    val plan = pr.queryExecution.optimizedPlan.toString()
    assert(plan.contains("LogicalRDD"), plan)
    assert(!plan.contains("Join"), s"unchecked lineage growth:\n$plan")
  }

  test("PlanAudit API: clean plans report clean, smells surface as warnings") {
    import graft.tools.PlanAudit
    val good = PlanAudit.audit(Relational.q5LocalSupplier(spark, sf))
    assert(good.broadcastJoins >= 4)
    assert(good.scans.nonEmpty && good.clean, good.render)
    val pushed = PlanAudit.audit(Relational.q6RevenueForecast(spark, sf))
    assert(pushed.scans.head.pushedFilters.contains("l_shipdate") ||
      pushed.scans.head.pushedFilters.contains("GreaterThanOrEqual"),
      pushed.render)
    // a deliberate cartesian must be flagged
    val bad = PlanAudit.audit(
      Tables.nation(spark, sf).crossJoin(Tables.region(spark, sf)))
    assert(bad.warnings.exists(_.contains("all-pairs")) ||
      bad.warnings.exists(_.contains("BroadcastNestedLoopJoin")), bad.render)
  }

  test("readIndexed composes with column pruning and filter pushdown") {
    import spark.implicits._
    val t = graft.etl.DeltaLite(spark,
      java.nio.file.Files.createTempDirectory("graft-idx-plan").toString,
      statsKey = "k")
    t.appendClustered((0L until 100L).map(k => (k, s"v$k", k * 2))
      .toDF("k", "v", "w"), numFiles = 4)
    val q = t.readIndexed().filter($"k" >= 50L).select($"k", $"v")
    val plan = physicalPlan(q)
    val readSchema = "ReadSchema:.*".r.findFirstIn(plan).getOrElse("")
    assert(readSchema.contains("k") && readSchema.contains("v") &&
      !readSchema.contains("w"), s"column pruning lost: $readSchema")
    val pushed = "PushedFilters: \\[[^\\]]*".r.findFirstIn(plan).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(k,50)"),
      s"filter not pushed: $pushed")
  }

  test("q_mode: two stacked aggregations, no window sort anywhere") {
    val plan = physicalPlan(graft.queries.Stats.qMode(spark, sf))
    assert(!plan.contains("Window"), "mode must not pay a window sort")
    val aggs = "HashAggregate|ObjectHashAggregate|SortAggregate".r
      .findAllIn(plan).length
    assert(aggs >= 4, s"expected partial+final for both stages: $aggs")
  }

  test("q_corr_stats: single pass — one scan, one aggregation exchange") {
    val plan = physicalPlan(graft.queries.Stats.qCorrStats(spark, sf))
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"corr must be one pass over the fact, got $scans scans")
    assert(!plan.contains("Window") && !plan.contains("Join"))
  }

  test("q_skyline: no dominance self-join — windowed prune only") {
    val plan = physicalPlan(graft.queries.Stats.qSkyline(spark, sf))
    assert(!plan.contains("Join"),
      "skyline must never plan the O(n^2) dominance join")
    assert(plan.contains("Window"))
  }

  test("q_countmin: sketch built with map-side partials and broadcast to the probe") {
    val plan = physicalPlan(graft.queries.Events.countMin(spark, sf))
    // the 1-row sketch rides a broadcast (hash or nested-loop — both
    // fine for one row), never a shuffle join
    assert(plan.contains("BroadcastExchange"), "the 1-row sketch must broadcast")
    assert(!plan.contains("SortMergeJoin"))
    assert(plan.contains("partial_countminagg"),
      "sketch must combine map-side before the single-partition merge")
    assert(plan.contains("cmsestimate"), "codegen point-lookup missing")
  }

  test("q_rolling_distinct: x7 expansion reads the persisted dedup, events scanned once") {
    val plan = physicalPlan(graft.queries.Stats.qRollingDistinct(spark, sf))
    assert(plan.contains("Generate explode"))
    // both the DAU and WAU branches read the materialized (day,user)
    // dedup — the raw events parquet is scanned exactly once, inside
    // the cached relation's build plan
    val cacheReads = "InMemoryTableScan".r.findAllIn(plan).length
    assert(cacheReads >= 2, s"both branches must reuse the dedup: $cacheReads")
    // every parquet scan in the text sits INSIDE a cached-relation
    // build plan (the print repeats it per InMemoryTableScan); outside
    // the cache the raw events are never re-read
    val firstScan = plan.indexOf("FileScan parquet")
    val firstCache = plan.indexOf("InMemoryRelation")
    assert(firstCache >= 0 && firstCache < firstScan,
      "a raw events scan escaped the persisted dedup")
  }

  test("q_sketch_setops: broadcast equi-joins only, no nested-loop pair blowup") {
    val df = graft.queries.Events.sketchSetops(spark, sf)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString()
    // pair expansion is a broadcast EQUI-join on event_type and the
    // single-count lookups broadcast too — a cartesian/nested-loop
    // pair join would explode at real segment counts
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 3)
  }

  test("q_semi_join: left-semi with the filtered orders side broadcast") {
    val plan = physicalPlan(Relational.qSemiJoin(spark, sf))
    assert(plan.contains("LeftSemi"), "must plan a semi join, not join+distinct")
    assert(plan.contains("BroadcastHashJoin"),
      "filtered urgent-orders build side must broadcast")
  }

  test("q_fuzzy_join: one equality shuffle on the block key, JW inside codegen") {
    val plan = physicalPlan(Text.fuzzyPairs(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "fuzzy match must stay blocked — never all-pairs")
    // the JW kernel is a codegen'd expression, not a UDF
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
    assert(plan.toLowerCase.contains("jarowinkler"),
      "custom expression missing from the plan")
  }

  test("q_attribution: argmax via struct-max aggregate, no window over the join blowup") {
    val plan = physicalPlan(graft.queries.Temporal.qAttribution(spark, sf))
    assert(!plan.contains("Window"),
      "last-click pick must be a struct-max aggregate, not a ranked window")
    // struct-typed max plans as SortAggregate (interpreted ordering) —
    // still partial+final, still no rank sort over the joined blowup
    assert(plan.contains("Aggregate"),
      "argmax must partial-aggregate map-side")
    assert(plan.contains("partial_max") || plan.contains("partial_"),
      "aggregate must combine map-side before the exchange")
  }

  test("q_margin_mining: every window key-partitioned, broadcast fan-outs only, no shuffled cartesian") {
    val df = graft.queries.Vectors.marginMining(spark, sf)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString()
    // the forward/reverse scorings fan a BOUNDED broadcast side over a
    // corpus scan (the bruteForce shape) — a shuffled CartesianProduct
    // would mean the broadcast guard was lost
    assert(!plan.contains("CartesianProduct"),
      "margin mining must broadcast its bounded side, never shuffle a cartesian")
    // every Window is partitioned by a key (query_id / matched_id) —
    // no corpus-wide single-partition rank
    val analyzed = df.queryExecution.optimizedPlan
    val badWindow = analyzed.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(badWindow.isEmpty,
      "margin mining planned an unpartitioned (single-partition) window")
  }

  test("q_hybrid_rrf: bounded rank windows over top-50 lists, no cartesian, no corpus-wide window") {
    val df = Text.hybridRrf(spark, sf)
    df.collect() // finalize AQE so the executed shapes are visible
    val plan = df.queryExecution.executedPlan.toString()
    // both retriever lists bound via distributed top-k BEFORE any
    // window touches them — the windows then rank 50 rows, not corpus
    assert(plan.contains("TakeOrderedAndProject"),
      "top-50 cuts must be TakeOrderedAndProject, not a global sort")
    val windows = "Window".r.findAllIn(plan).length
    assert(windows >= 2 && windows <= 4,
      s"expected the two bounded rank windows, saw $windows Window markers")
    assert(!plan.contains("CartesianProduct"))
  }

  test("plan fingerprint: stable across sessions, changes when the plan shape changes") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val parts = Tables.part(spark, sf).select("p_partkey", "p_name")
    val bhj = li.join(org.apache.spark.sql.functions.broadcast(parts),
      $"l_partkey" === $"p_partkey")
    val smj = li.hint("merge").join(parts, $"l_partkey" === $"p_partkey")
    // same query built twice → same sha (expr ids differ, hash must not)
    val again = Tables.lineitem(spark, sf).join(
      org.apache.spark.sql.functions.broadcast(
        Tables.part(spark, sf).select("p_partkey", "p_name")),
      $"l_partkey" === $"p_partkey")
    val f1 = graft.tools.PlanAudit.fingerprint(bhj)
    assert(f1 == graft.tools.PlanAudit.fingerprint(again),
      "identical plan shape must fingerprint identically across builds")
    assert(f1 != graft.tools.PlanAudit.fingerprint(smj),
      "a join-strategy flip (lost broadcast) must change the fingerprint")
    assert(f1.matches("[0-9a-f]{12}"))
  }

  test("plan fingerprint: non-last children (':-' connectors) carry their depth") {
    // every join's FIRST child prints with ":-"; before the fix those
    // lines normalized to depth 0, so reparenting inside a left subtree
    // hashed identically to the flat shape — defeating the fingerprint
    val nested =
      """SortMergeJoin [a], [b], Inner
        |:- Sort [a ASC]
        |:  +- Exchange hashpartitioning(a, 32)
        |:     +- Filter isnotnull(a)
        |+- Sort [b ASC]""".stripMargin
    val flat =
      """SortMergeJoin [a], [b], Inner
        |:- Sort [a ASC]
        |:- Exchange hashpartitioning(a, 32)
        |:- Filter isnotnull(a)
        |+- Sort [b ASC]""".stripMargin
    val n = graft.tools.PlanAudit.normalizedForTest(nested)
    val f = graft.tools.PlanAudit.normalizedForTest(flat)
    assert(n != f, "left-subtree nesting must change the normalized shape")
    // and the ':-' lines must not all sit at depth 0
    val depths = n.linesIterator.map(_.takeWhile(_.isDigit).toInt).toList
    assert(depths.distinct.size > 2,
      s"expected distinct depths for nested ':-' children, got $depths")
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
