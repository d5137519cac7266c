package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series queries over `events` (SURVEY.md §2c). Batch shapes here;
  * the incremental/streaming equivalents live in graft.streaming.
  */
object Events {

  /** Hard cap on [[sketchSetops]]' driver-side segment list (the pair
    * expansion is quadratic in it); past this the query fails with a
    * clear error instead of OOMing the driver.
    */
  val SketchSetopsMaxTypes = 10000

  /** [[madOutliers]] keeps Spark's exact `percentile` (one counter per
    * DISTINCT cents value per type — cents-exact, what the oracle
    * hashes) while a cheap domain probe stays at or below this bound
    * (~16 MB of counter state per group); a wider domain (micro-priced
    * or unbounded values at 100 TB) would grow that buffer without
    * limit, so the medians switch to the O(capacity) KLL sketch
    * instead (rank-error-bounded, spec-asserted past capacity).
    */
  val MadExactDomainBound = 1L << 20

  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(12, 2))).cast("double")

  /** Cohort retention: users bucketed by days since their own first
    * event. Two aggregations — per-user first date, then distinct
    * users per offset; the self-join back to events shuffles on
    * user_id once (the firsts table is per-user and AQE-broadcastable
    * when small).
    */
  def retention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"user_id", $"ts".cast("date").as("d"))
    val firsts = ev.groupBy($"user_id").agg(min($"d").as("d0"))
    ev.join(firsts, "user_id")
      .groupBy(datediff($"d", $"d0").as("day_offset"))
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"day_offset")
  }

  /** Ordered funnel: signup → first click at-or-after it → first
    * purchase at-or-after that click, per user; stage populations are
    * counts over left joins of the per-user stage tables (each stage's
    * users are a subset of the previous — no cross join needed for the
    * single summary row).
    */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val sgn = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("t_signup"))
    val clk = ev.filter($"event_type" === "click")
      .join(sgn, "user_id").filter($"ts" >= $"t_signup")
      .groupBy($"user_id").agg(min($"ts").as("t_click"))
    val pur = ev.filter($"event_type" === "purchase")
      .join(clk, "user_id").filter($"ts" >= $"t_click")
      .groupBy($"user_id").agg(min($"ts").as("t_purchase"))
    sgn.join(clk, Seq("user_id"), "left")
      .join(pur, Seq("user_id"), "left")
      .agg(count($"t_signup").as("n_signup"),
        count($"t_click").as("n_click"),
        count($"t_purchase").as("n_purchase"))
  }

  /** Tumbling 1-hour windows: the batch twin of the streaming windowed
    * aggregation (single shuffle on the truncated hour).
    */
  def tumbling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", $"ts").as("hour"))
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
      .orderBy($"hour")
  }

  /** Heavy hitters per user segment via the Misra–Gries sketch
    * aggregate ([[graft.functions.FreqItemsSketch]]): state is ≤ k
    * counters per group however many rows stream through, with
    * map-side partials. Here the per-segment cardinality (5 event
    * types) is below k=8, so the sketch counts are exact and the
    * DuckDB GROUP BY oracle matches bit-for-bit; at real cardinality
    * the same plan degrades gracefully to the MG guarantee instead of
    * blowing up the shuffle.
    */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(($"user_id" % 10).as("segment"))
      .agg(graft.functions.SketchFunctions.freq_items($"event_type", 8).as("sk"))
      .select($"segment", explode($"sk").as("e"))
      .select($"segment", $"e.item".as("item"), $"e.cnt".as("cnt"))
      .orderBy($"segment", $"item")
  }

  /** Frequency estimates from ONE count-min sketch of the whole events
    * stream: the sketch is a single depth×width counter grid built in
    * one map-side-combinable aggregate (merge = element-wise add, so
    * the state is merge-order-independent — bit-identical on any
    * cluster layout), then each event type probes it via the
    * codegen-resident `cms_estimate`. At this distinct count (5 types,
    * width 1024) the fixed hash family is collision-free, so every
    * estimate is EXACT and the oracle is a plain GROUP BY count — the
    * same estimate-vs-exact contract as the heavy-hitters and distinct
    * sketches. At 100 TB the sketch replaces a full frequency-table
    * shuffle with 32 KB of state per partition.
    */
  def countMin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.SketchFunctions._
    val sk = Tables.events(s, dir)
      .agg(count_min($"event_type", depth = 4, width = 1024).as("sk"))
      .withColumn("k", lit(1))
    val types = Tables.events(s, dir).select($"event_type").distinct()
      .withColumn("k", lit(1))
    types.join(broadcast(sk), "k")
      .select($"event_type",
        cms_estimate($"sk", $"event_type", depth = 4, width = 1024).as("est"))
      .orderBy($"event_type")
  }

  /** Distinct users per event type via the mergeable distinct-count
    * sketch (exact at this cardinality; HLL registers past the
    * threshold). At 100 TB this replaces COUNT(DISTINCT)'s
    * shuffle-every-distinct-value plan with ≤ max(threshold, 2^p)
    * bytes of partial state per partition.
    */
  def distinctSketch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(graft.functions.SketchFunctions
        .distinct_sketch($"user_id", exactThreshold = 8192).as("n_users"))
      .orderBy($"event_type")
  }

  /** Re-aggregatable sketch rollup (the Druid/BigQuery sketch-column
    * pattern): per-(type, DAY) distinct-user sketch STATES materialize
    * in one pass, then the weekly answer is a MERGE of the daily
    * states — the raw events are never re-scanned for the coarser
    * grain. At 100 TB this is how distinct-count dashboards work: the
    * daily sketch table is a few KB per bucket, and any rollup
    * (weekly, monthly, per-type-overall) merges states instead of
    * recounting events. Exact below the sparse threshold — which the
    * oracle's plain COUNT(DISTINCT) checks.
    */
  def sketchReagg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.SketchFunctions._
    val daily = Tables.events(s, dir)
      .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
      .agg(distinct_state($"user_id", exactThreshold = 8192).as("state"))
    daily
      .groupBy($"event_type", date_trunc("week", $"day").as("week"))
      .agg(distinct_merge($"state", exactThreshold = 8192).as("n_users"))
      .orderBy($"event_type", $"week")
  }

  /** Distinct-sketch SET OPERATIONS (the Theta-sketch/Druid segment-
    * overlap pattern): per-type distinct-user sketch STATES materialize
    * in one events pass; every pairwise audience overlap then comes
    * from MERGED states by inclusion-exclusion (|A∩B| = |A|+|B|−|A∪B|)
    * — the raw events are never re-scanned per pair. At 100 TB this is
    * how audience-overlap dashboards work: states are a few KB per
    * segment, and any pair/group overlap merges summaries instead of
    * recounting. The per-type state frame is referenced three times —
    * identical aggregate subtrees, so Spark's exchange reuse serves
    * one pass; the type LIST (a handful by design, no '|' in names) is
    * bounded driver metadata, same pattern as the IVF centroid reads.
    * Exact below the sparse threshold — which the oracle's plain
    * COUNT(DISTINCT) arithmetic checks.
    */
  def sketchSetops(s: SparkSession, dir: String): DataFrame =
    sketchSetopsOn(Tables.events(s, dir))

  /** Core of [[sketchSetops]] over any (event_type, user_id) frame;
    * `maxTypes` is exposed for the guard spec.
    */
  private[graft] def sketchSetopsOn(ev: DataFrame,
      maxTypes: Int = SketchSetopsMaxTypes): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    import graft.functions.SketchFunctions._
    val states = ev
      .groupBy($"event_type")
      .agg(distinct_state($"user_id", exactThreshold = 8192).as("st"),
        distinct_sketch($"user_id", exactThreshold = 8192).as("n"))
    // bounded-model-state collect WITH a cardinality guard: the type
    // list is driver metadata and the pair expansion is inherently
    // quadratic in it — a mis-keyed column (user_id here, say) must
    // fail loudly, not OOM the driver with a million-row collect. The
    // limit bounds the fetch itself; the require names the cause.
    val typeRows = states.select($"event_type")
      .limit(maxTypes + 1)
      .collect().map(_.getString(0)).sorted
    require(typeRows.length <= maxTypes,
      s"sketchSetops: more than $maxTypes distinct segment " +
        "values — pairwise overlap is quadratic in segments and the " +
        "segment list is driver-side; did you key on a high-cardinality " +
        "column by mistake?")
    val pairs = for { a <- typeRows; b <- typeRows if a < b } yield (a, b)
    val tag = pairs.toSeq.flatMap { case (a, b) =>
      Seq((a, s"$a|$b"), (b, s"$a|$b"))
    }.toDF("event_type", "pair")
    val unions = states.join(broadcast(tag), "event_type")
      .groupBy($"pair")
      .agg(distinct_merge($"st", exactThreshold = 8192).as("n_union"))
    val singles = states.select($"event_type", $"n")
    unions
      .withColumn("type_a", split($"pair", "\\|")(0))
      .withColumn("type_b", split($"pair", "\\|")(1))
      .join(broadcast(singles.toDF("type_a", "n_a")), "type_a")
      .join(broadcast(singles.toDF("type_b", "n_b")), "type_b")
      .select($"type_a", $"type_b", $"n_a", $"n_b", $"n_union",
        ($"n_a" + $"n_b" - $"n_union").as("n_common"))
      .orderBy($"type_a", $"type_b")
  }

  /** Partition-pruned scan: events land as hive-partitioned parquet on
    * event_type; the purchase-only aggregate then reads ONE directory
    * of five — at 100 TB the difference between scanning the lake and
    * scanning the slice (PlanAuditSpec asserts the PartitionFilters).
    * The one-time partitioned write is measured with the query, same
    * honesty rule as the bucketed join.
    */
  def partitionPruned(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = s"${sys.props("java.io.tmpdir")}/graft-partitioned/" +
      s"events_${dir.hashCode & 0x7fffffff}"
    graft.sources.Sources.writePartitioned(
      Tables.events(s, dir), out, Seq("event_type"))
    s.read.parquet(out)
      .filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_purchases"), dsum($"value").as("sum_value"))
      .filter($"n_purchases" >= 3)
      .orderBy($"user_id")
  }

  /** The DeltaLite twin of [[partitionPruned]]: the same purchase
    * aggregate over a DeltaLite table DECLARED partitioned by
    * event_type — the partition spec lives in the commit log, the
    * write lays out hive dirs, and the commit-log FileIndex feeds each
    * file's path-encoded partition value to scan planning as a [v,v]
    * range, so the filter plans ONE partition's files with no manual
    * pruning (PlanAuditSpec asserts the file count). At 100 TB,
    * declared partition columns are the first-line pruning tool: the
    * scan never lists the other partitions' files at all. The one-time
    * partitioned load is measured with the query, same honesty rule
    * as the plain-parquet twin.
    */
  /** Content fingerprint of the source events parquet (file names +
    * sizes + mtimes): the partitioned-table caches key on it so a
    * REGENERATED dataset at the same path rebuilds the table instead
    * of silently serving stale rows that diverge from the oracle. */
  private def eventsFingerprint(s: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    val leaves =
      if (st.isFile) Seq(st)
      else fs.listStatus(p).toSeq.filter(_.isFile)
    val sig = leaves.map(f =>
        s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
      .sorted.mkString("|")
    java.lang.Long.toHexString(
      org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
        sig.getBytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        sig.getBytes.length, 42) & 0xffffffffL)
  }

  def deltaPartitionPruned(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = s"${sys.props("java.io.tmpdir")}/graft-dlpart/" +
      s"events_${dir.hashCode & 0x7fffffff}_${eventsFingerprint(s, dir)}"
    val t = new graft.etl.DeltaLite(s, root,
      partitionBy = Seq("event_type"))
    if (t.latestVersion.isEmpty) t.append(Tables.events(s, dir))
    t.readIndexed()
      .filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_purchases"), dsum($"value").as("sum_value"))
      .filter($"n_purchases" >= 3)
      .orderBy($"user_id")
  }

  /** The CATALOG-SQL path end-to-end: events land in a NAMED DeltaLite
    * table via `CREATE TABLE … AS SELECT` through the DSv2
    * [[graft.catalog.GraftCatalog]], and the aggregate reads it back
    * with nothing but `SELECT … FROM graft.gold.<t>` — the reference's
    * analyst workflow (`saveAsTable` + `spark.table`,
    * ETL_pipeline_countries.py:129-138) with zero manual view
    * registration. The read resolves through the commit-log skipping
    * FileIndex (GraftCatalogReads substitution). Table cache keys on a
    * content fingerprint so regenerated testdata rebuilds it; the
    * one-time CTAS is measured with the query, same honesty rule as
    * the other landed-layout queries.
    */
  def catalogSql(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.catalog.graft",
      classOf[graft.catalog.GraftCatalog].getName)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.gold")
    val tbl = s"events_${dir.hashCode & 0x7fffffff}_${eventsFingerprint(s, dir)}"
    val exists = s.sql("SHOW TABLES IN graft.gold").collect()
      .exists(_.getString(1) == tbl)
    if (!exists) {
      Tables.events(s, dir).createOrReplaceTempView("graft_events_src")
      s.sql(s"CREATE TABLE graft.gold.$tbl AS " +
        "SELECT * FROM graft_events_src")
    }
    s.sql(
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  COUNT(DISTINCT user_id) AS n_users,
         |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
         |FROM graft.gold.$tbl
         |WHERE event_type IN ('click', 'purchase')
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin)
  }

  /** The SQL DML surface end-to-end on a catalog table: CTAS a fresh
    * copy of events, then UPDATE (file-granular copy-on-write), DELETE
    * (deletion-vector sidecar), and MERGE (conditional assignment
    * clauses) purely through SQL, and read the final aggregate back.
    * The table is recreated every run so the DML is deterministic; the
    * one-time CTAS is measured with the query (same honesty rule as
    * the z-order/bucketed writes). The oracle re-derives the identical
    * end state with plain CTEs over the flat events table.
    */
  def dmlSql(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.catalog.graft",
      classOf[graft.catalog.GraftCatalog].getName)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.gold")
    val tbl = s"dml_${dir.hashCode & 0x7fffffff}"
    s.sql(s"DROP TABLE IF EXISTS graft.gold.$tbl")
    Tables.events(s, dir).createOrReplaceTempView("graft_dml_src")
    s.sql(s"CREATE TABLE graft.gold.$tbl AS " +
      "SELECT event_id, user_id, event_type, value FROM graft_dml_src")
    s.sql(s"UPDATE graft.gold.$tbl SET event_type = 'viewed', " +
      "value = value * 2 WHERE event_type = 'view' AND user_id < 20")
    s.sql(s"DELETE FROM graft.gold.$tbl " +
      "WHERE event_type = 'click' AND user_id < 10")
    s.sql(
      s"""MERGE INTO graft.gold.$tbl t USING
         |  (SELECT event_id, value FROM graft_dml_src
         |   WHERE event_type = 'purchase' AND user_id < 5) s
         |ON t.event_id = s.event_id
         |WHEN MATCHED THEN UPDATE SET value = t.value + s.value""".stripMargin)
    s.sql(
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM graft.gold.$tbl
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin)
  }

  /** The SESSION-catalog `USING delta-lite LOCATION` surface
    * end-to-end (the last SQL surface that was spec-only): a plain
    * metastore entry whose provider is the delta-lite TableProvider —
    * CREATE with an explicit schema + LOCATION, INSERT INTO from the
    * flat events table, then UPDATE (copy-on-write rewrite) and
    * DELETE (deletion-vector sidecar) routed through the SAME GraftDml
    * conversions as graft-catalog tables, and the final aggregate read
    * back through the commit-log FileIndex. Location + entry are
    * dropped and recreated each run so the lifecycle is actually
    * exercised; the oracle re-derives the end state with a CASE +
    * anti-filter over the flat table.
    */
  def sessionCatalogSql(s: SparkSession, dir: String): DataFrame = {
    val key = dir.hashCode & 0x7fffffff
    val tbl = s"graft_scdl_$key"
    val root = s"${sys.props("java.io.tmpdir")}/graft-scdl/$key/t"
    s.sql(s"DROP TABLE IF EXISTS $tbl")
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(rootPath)) fs.delete(rootPath, true)
    Tables.events(s, dir).createOrReplaceTempView("graft_scdl_src")
    s.sql(s"CREATE TABLE $tbl (event_id BIGINT, user_id BIGINT, " +
      s"event_type STRING, value DOUBLE) USING `delta-lite` LOCATION '$root'")
    s.sql(s"INSERT INTO $tbl SELECT event_id, user_id, event_type, value " +
      "FROM graft_scdl_src WHERE event_type <> 'error'")
    s.sql(s"UPDATE $tbl SET value = value * 2 " +
      "WHERE event_type = 'view' AND user_id < 20")
    s.sql(s"DELETE FROM $tbl WHERE event_type = 'click' AND user_id < 10")
    s.sql(
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM $tbl
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin)
  }

  /** Composite-key MERGE + WHEN NOT MATCHED BY SOURCE through SQL —
    * the round-6 DML depth: the business key is the COMPOUND
    * (user_id, event_type) pair (the reference's own keys are
    * compound, ETL_pipeline_countries.py:128-138), the ON clause is a
    * conjunction of equalities, and the mirror-sync clauses fire for
    * target groups absent from the incremental slice (view-groups
    * delete, others get flagged n = -1). The oracle re-derives the
    * identical end state with a LEFT JOIN + CASE in DuckDB. Decimal
    * sums keep the arithmetic engine-exact; double only at the end.
    */
  def dmlMergeMulti(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.catalog.graft",
      classOf[graft.catalog.GraftCatalog].getName)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.gold")
    val tbl = s"dmlm_${dir.hashCode & 0x7fffffff}"
    s.sql(s"DROP TABLE IF EXISTS graft.gold.$tbl")
    Tables.events(s, dir).createOrReplaceTempView("graft_dmlm_src")
    s.sql(s"""CREATE TABLE graft.gold.$tbl AS
      |SELECT user_id, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
      |FROM graft_dmlm_src GROUP BY user_id, event_type""".stripMargin)
    s.sql(
      s"""MERGE INTO graft.gold.$tbl t USING
         |  (SELECT user_id, event_type, COUNT(*) AS n2,
         |     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS t2
         |   FROM graft_dmlm_src WHERE event_id % 3 = 0
         |   GROUP BY user_id, event_type) s
         |ON t.user_id = s.user_id AND t.event_type = s.event_type
         |WHEN MATCHED THEN UPDATE SET
         |  total = CAST(t.total + s.t2 AS DECIMAL(18,2)), n = t.n + s.n2
         |WHEN NOT MATCHED THEN INSERT (user_id, event_type, n, total)
         |  VALUES (s.user_id, s.event_type, s.n2, s.t2)
         |WHEN NOT MATCHED BY SOURCE AND t.event_type = 'view' THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET n = -1
         |""".stripMargin)
    s.sql(
      s"""SELECT event_type, COUNT(*) AS n_groups,
         |  CAST(SUM(n) AS BIGINT) AS sum_n,
         |  CAST(SUM(total) AS DOUBLE) AS sum_total
         |FROM graft.gold.$tbl
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin)
  }

  /** COPY INTO end-to-end: two arrival batches land in a source
    * directory and two copyInto calls ingest them incrementally (the
    * second loads ONLY the new batch; a third is a no-op) — then the
    * table aggregate must equal the flat-table aggregate over both
    * slices. A double-ingest (ledger failure) would double every
    * count and hash-mismatch the oracle. Fresh dirs each run so the
    * incremental protocol is actually exercised, not replayed.
    */
  def copyIntoSql(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = s"${sys.props("java.io.tmpdir")}/graft-copyinto/" +
      s"${dir.hashCode & 0x7fffffff}"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val ev = Tables.events(s, dir)
      .select($"event_id", $"user_id", $"event_type", $"value")
    ev.filter($"event_type" === "purchase")
      .write.parquet(s"$base/src/b1")
    val t = graft.etl.DeltaLite(s, s"$base/tbl")
    t.copyInto(s"$base/src")
    ev.filter($"event_type" === "click")
      .write.parquet(s"$base/src/b2")
    t.copyInto(s"$base/src")
    require(t.copyInto(s"$base/src").isEmpty, "third pass must be a no-op")
    t.read()
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy($"event_type")
  }

  /** Z-order-clustered scan: events written Morton-interleaved on
    * (user_id, day), then a 2-D box predicate (user range × day range)
    * reads only the files/row-groups whose bounding box intersects it
    * — multi-dimensional data skipping, where a linear sort would
    * cover one dimension only (ZOrderSpec audits the layout's overlap
    * counts). The one-time clustered write is measured with the
    * query, same honesty rule as the bucketed join; results ≡ the
    * flat-table filter, which is what the oracle computes.
    */
  def zorderPruned(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = s"${sys.props("java.io.tmpdir")}/graft-zorder/" +
      s"events_${dir.hashCode & 0x7fffffff}"
    val ev = Tables.events(s, dir)
      .withColumn("day_idx", datediff($"ts".cast("date"), lit("2024-01-01").cast("date")))
    graft.ops.ZOrder.clusterWrite(ev, out, $"user_id", $"day_idx",
      numFiles = 16, bits = 12)
    s.read.parquet(out)
      .filter($"user_id".between(40, 80) &&
        $"day_idx".between(9, 14))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
      .orderBy($"event_type")
  }

  /** Deterministic stratified sampling: per-class rates (downsample
    * the dominant classes, keep the rare ones) decided by a
    * content-independent md5 of the event id — the reproducible,
    * engine-portable rebalancing pass a training pipeline runs before
    * export. Map-only membership (no shuffle until the audit counts),
    * same event sampled on any cluster, any run, any engine.
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // first two md5 hex chars = uniform bucket in [0, 256); lowercase
    // hex sorts lexicographically = numerically, so a string compare
    // is the engine-portable threshold (no base conversion needed)
    val bucket = substring(md5($"event_id".cast("string")), 1, 2)
    val keep = bucket < when($"event_type" === "view", "20")
      .when($"event_type" === "click", "40")
      .otherwise("zz")
    Tables.events(s, dir).filter(keep)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_sampled"), dsum($"value").as("sum_value"))
      .orderBy($"event_type")
  }

  /** Sessionization as gaps-and-islands: one shuffle on user_id, then
    * window functions — no iterative driver logic. 30-minute gap.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gapUs = 1800L * 1000000L
    // unix_micros only accepts TIMESTAMP; the loader may serve
    // TIMESTAMP_NTZ (generator-dependent) — the cast is a no-op for
    // TIMESTAMP and a value-preserving reinterpretation for NTZ under
    // the session's pinned UTC zone
    val tsUs = unix_micros($"ts".cast("timestamp"))
    Tables.events(s, dir)
      .withColumn("prev_us", lag(tsUs, 1).over(w))
      .withColumn("new_sess",
        when($"prev_us".isNull || tsUs - $"prev_us" > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        min($"ts").as("t_start"), max($"ts").as("t_end"),
        dsum($"value").as("sum_value"))
      .orderBy($"user_id", $"session_id")
  }

  /** Sessionization via the built-in `session_window` aggregate — the
    * same 30-minute-gap semantics as [[sessionize]] but expressed as a
    * native windowed groupBy (one shuffle on (user, merged window);
    * Spark merges overlapping per-event [ts, ts+gap) windows, so a gap
    * of exactly 30:00 starts a NEW session — the oracle's
    * microsecond-diff `>= gap` flag reproduces that boundary exactly).
    * Streaming-transferable: the identical expression runs under
    * `readStream` with a watermark.
    */
  def sessionWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
      .select($"user_id", $"w.start".as("t_start"), $"w.end".as("t_end"),
        $"n_events", $"sum_value")
      .orderBy($"user_id", $"t_start")
  }

  /** Time-series resampling: each user's daily activity gap-filled to a
    * dense calendar (zero-filled counts, last-observation-carried-
    * forward daily value). The calendar is generated per user from the
    * aggregated span — `sequence` + `explode` over ALREADY-AGGREGATED
    * per-user rows, so the expansion never touches the raw fact scan;
    * the LOCF is one window pass over the dense frame.
    */
  def gapFill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .groupBy($"user_id", $"ts".cast("date").as("d"))
      .agg(count(lit(1)).as("n"), dsum($"value").as("sv"))
    val cal = daily.groupBy($"user_id")
      .agg(min($"d").as("d0"), max($"d").as("d1"))
      .select($"user_id", explode(sequence($"d0", $"d1")).as("d"))
    val w = Window.partitionBy($"user_id").orderBy($"d")
      .rowsBetween(Window.unboundedPreceding, 0)
    cal.join(daily, Seq("user_id", "d"), "left")
      .select($"user_id", $"d",
        coalesce($"n", lit(0L)).as("n_events"),
        last($"sv", ignoreNulls = true).over(w).as("locf_value"))
      .orderBy($"user_id", $"d")
  }

  /** Event transition matrix: per-user consecutive event-type bigrams
    * (the path-analysis primitive behind "what do users do next").
    * One shuffle on user_id for the lag window, then a tiny
    * #types² aggregate with map-side partials.
    */
  def transitionMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy($"prev_type", $"event_type")
  }

  /** Per-group outlier detection: events beyond 2σ of their type's
    * mean. Mean and variance come from exact decimal sums (Σv, Σv² —
    * both order-independent), so the double threshold is bit-identical
    * across engines and partitionings; the per-type stats are a tiny
    * broadcast joined back map-side — the fact scans twice but never
    * shuffles full rows.
    */
  /** Robust (MAD) anomaly detection per event type — the
    * median-absolute-deviation rule that, unlike [[outliers]]'s
    * z-score, is immune to the outliers' own pull on the threshold
    * (median breakdown point 50% vs the mean's 0). Exactness across
    * engines: values quantize to integer CENTS before the medians, so
    * every interpolated median is an exactly-representable half/quarter
    * and the deviation arithmetic stays float-deterministic. Scale:
    * the exact `percentile` aggregate buffers COUNTS PER DISTINCT
    * VALUE per group — bounded ONLY by the cents-domain width, so a
    * one-row domain probe picks the engine: exact percentile while the
    * domain is at most [[MadExactDomainBound]] (price-like values —
    * the gate case, cents-exact for the oracle), the O(capacity) KLL
    * [[graft.functions.QuantileSketch]] beyond it (unbounded value
    * domains at 100 TB would otherwise grow the buffer into executor
    * OOM). Two grouped aggregates + one broadcast join back either
    * way, no windows.
    */
  def madOutliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    madOutliersOn(Tables.events(s, dir)
      .select($"event_type", $"event_id",
        round($"value" * 100).cast("long").as("cents")))
  }

  /** Core of [[madOutliers]] over a pre-quantized (event_type,
    * event_id, cents) frame; `exactDomainBound` is exposed for the
    * spec that forces the sketch path on a wide synthetic domain.
    */
  private[graft] def madOutliersOn(ev: DataFrame,
      exactDomainBound: Long = MadExactDomainBound): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    // one-row probe (legitimate bounded driver state, like the IVF
    // centroid reads): ±2% HLL error is fine — the bound is a memory
    // guard, not a semantic threshold
    val domainWidth = ev.agg(
      approx_count_distinct($"cents").as("d")).head.getLong(0)
    val exact = domainWidth <= exactDomainBound
    // the engine switch changes results DISCONTINUOUSLY with data
    // width (and the ±2% probe blurs the switch point) — surface the
    // choice so a consumer comparing against an exact oracle can tell
    // an approximate run apart instead of chasing a phantom mismatch
    if (!exact) org.slf4j.LoggerFactory.getLogger(getClass).warn(
      s"madOutliers: cents domain ≈$domainWidth exceeds exact bound " +
        s"$exactDomainBound — medians computed via KLL sketch " +
        "(approximate), not the exact percentile aggregate")
    def med(colName: String, alias: String): Column =
      if (exact)
        expr(s"percentile($colName, 0.5)").as(alias)
      else graft.functions.SketchFunctions
        .quantile_sketch(col(colName), Seq(0.5), capacity = 1 << 17)(0)
        .as(alias)
    val m = ev.groupBy($"event_type".as("t"))
      .agg(med("cents", "med_cents"))
    val dev = ev.join(broadcast(m), $"event_type" === $"t")
      .withColumn("dev", abs($"cents" - $"med_cents"))
    val mad = dev.groupBy($"t".as("t2"))
      .agg(med("dev", "mad_cents"))
    dev.join(broadcast(mad), $"t" === $"t2")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(when($"dev" > $"mad_cents" * 4.4478, 1L).otherwise(0L))
          .as("n_outliers"),
        (max($"med_cents") / 100.0).as("median_v"),
        (max($"mad_cents") / 100.0).as("mad_v"))
      .orderBy($"event_type")
  }

  def outliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dec2 = (c: Column) => c.cast(DecimalType(12, 2))
    val stats = Tables.events(s, dir)
      .groupBy($"event_type".as("t"))
      .agg(count(lit(1)).as("n"),
        dsum($"value").as("sv"),
        sum(dec2($"value") * dec2($"value")).cast("double").as("m2"))
      .withColumn("mean", $"sv" / $"n")
      .withColumn("sd", sqrt(($"m2" - $"n" * $"mean" * $"mean") / ($"n" - 1)))
    Tables.events(s, dir)
      .join(broadcast(stats), $"event_type" === $"t")
      .filter(abs($"value" - $"mean") > $"sd" * 2)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_outliers"),
        min($"value").as("min_v"), max($"value").as("max_v"),
        dsum($"value").as("sum_v"))
      .orderBy($"event_type")
  }

  /** Per-user stats with per-type conditional counts — the
    * high-cardinality groupBy shape (AQE handles user skew at scale).
    */
  def userStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val types = Seq("click", "view", "purchase", "signup", "error")
    val typeCounts = types.map(t =>
      count(when($"event_type" === t, 1)).as(s"n_$t"))
    val aggs = count(lit(1)).as("n_events") +: typeCounts :+
      dsum($"value").as("sum_value")
    Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy($"user_id")
  }

  /** Modern aggregate-function surface in one pass: conditional count
    * (`count_if`), boolean all/any reductions, and arg-min/arg-max
    * (`min_by`/`max_by`, keyed on the globally-unique event id so the
    * answer is tie-free). All map-side combinable.
    */
  def modernAggs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(
        expr("count_if(value > 400.0)").as("n_big"),
        expr("bool_and(value >= 0.0)").as("all_nonneg"),
        expr("bool_or(value > 499.0)").as("any_huge"),
        expr("max_by(user_id, event_id)").as("latest_writer"),
        expr("min_by(user_id, event_id)").as("first_writer"))
      .orderBy($"event_type")
  }

  /** Latest state per key — the CDC "current snapshot" read over a
    * change stream (the batch twin of what a MERGE-maintained dim
    * serves): one window shuffle, rank-1 row per user, deterministic
    * tie-break on event_id. WindowGroupLimit pushes the rank-1 cut
    * below the sort, so at scale only each partition's candidate rows
    * reach the final window.
    */
  def latestPerKey(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"ts".as("last_ts"),
        $"event_type".as("last_type"), $"value".as("last_value"))
      .orderBy($"user_id")
  }

  /** Day × event-type pivot via the DataFrame pivot API (explicit value
    * list keeps the plan static — required for a deterministic schema
    * at scale; nulls from absent combos filled to 0).
    */
  def pivotDaily(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val types = Seq("click", "view", "purchase", "signup", "error")
    Tables.events(s, dir)
      .groupBy(date_trunc("day", $"ts").cast("date").as("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy($"day")
  }

  /** Gaps-and-islands: consecutive active days per user collapse into
    * streak islands (day − row_number is constant within a run), kept
    * at length ≥ 3. Two window passes over the deduped (user, day)
    * table — the distinct shrinks the fact first, so the window sort
    * runs on ~users×days rows, not raw events; everything after the
    * dedup shuffle is partition-local.
    */
  def gapsIslands(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val days = Tables.events(s, dir)
      .select($"user_id", date_trunc("day", $"ts").cast("date").as("day"))
      .distinct()
    val w = Window.partitionBy($"user_id").orderBy($"day")
    days
      .withColumn("grp", date_sub($"day", row_number().over(w)))
      .groupBy($"user_id", $"grp")
      .agg(min($"day").as("start_day"), max($"day").as("end_day"),
        count(lit(1)).as("n_days"))
      .filter($"n_days" >= 3)
      .select($"user_id", $"start_day", $"end_day", $"n_days")
      .orderBy($"user_id", $"start_day")
  }

  /** Running count-distinct window: per user, how many events until
    * every event type they ever use was seen at least once
    * ("time to full coverage"). Spark has no exact count-distinct
    * window function — `size(collect_set)` over the running frame is
    * the idiomatic equivalent; the per-user type total then comes from
    * the same pass (max of the running count), so the fact is scanned
    * once, sorted once per user.
    */
  def coverage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    // per-user total from the SAME partitioning (full-frame max) — no
    // self-join, so the expensive collect_set window runs once
    val wAll = Window.partitionBy($"user_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, dir)
      .withColumn("r",
        size(collect_set($"event_type").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .cast("long"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n_types", max($"r").over(wAll))
      .filter($"r" === $"n_types")
      .groupBy($"user_id", $"n_types")
      .agg(min($"rn").as("events_to_cover"))
      .orderBy($"user_id")
  }
}
