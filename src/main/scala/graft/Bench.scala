package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Measurement discipline:
  *  - `noop`-format write fully materializes every output row (a bare
  *    `.count()` lets Catalyst drop final sorts and unread projections,
  *    under-measuring ordered/wide results).
  *  - two iterations per query, min reported — the min discards one-off
  *    GC / page-fault / JIT episodes that are VM noise, not plan cost.
  *  - failures surface in an `errors` field instead of being recorded
  *    as instant successes.
  *  - `noise_ratio` records each query's max/min across iterations;
  *    a ratio over ~3 marks a timing poisoned by a VM page-fault/GC
  *    episode so noise and plan regressions separate mechanically.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.catalog.graft",
        classOf[graft.catalog.GraftCatalog].getName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up JIT/codegen/parquet readers on the tiny SF so per-query
    // timings measure the queries, not first-use JVM costs
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // normalized plan fingerprint per query (PlanAudit.fingerprint):
    // diffable round-over-round, so a lost broadcast or a new Exchange
    // surfaces as a plan_sha change even when timings are noisy.
    // Captured AFTER the timed write from the same DataFrame — zero
    // timing impact, zero extra side effects.
    val planShas = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      var df: org.apache.spark.sql.DataFrame = null
      try { df = fn(spark, sfDir); df.write.format("noop").mode("overwrite").save() }
      catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(1).mkString.take(200)
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      if (df != null && !planShas.contains(name))
        try planShas(name) = graft.tools.PlanAudit.fingerprint(df)
        catch { case scala.util.control.NonFatal(_) => () }
      // release dedup-pass caches so iterations measure cold plans and
      // cached blocks don't accumulate across the run
      graft.ops.Dedup.releaseCaches()
      elapsed
    }
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    // optional comma-separated subset for local profiling runs
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n))
    }
    val results = selected.map { case (name, fn) =>
      var times = (0 until iters).map(_ => timeOnce(name, fn)).toVector
      // The VM's page-fault/GC episodes last seconds and cluster — they
      // can poison every base iteration of one query. A slow min gets
      // up to two extra chances so the reported figure reflects the
      // plan, not the episode (genuinely slow queries just confirm).
      // scale-curve windows (every key legitimately slow) disable the
      // retry budget via SPARK_GRAFT_BENCH_RETRIES=0
      val maxRetries = sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRIES", "2").toInt
      var extra = 0
      while (times.min > 4.0 && extra < maxRetries && !errors.contains(name)) {
        val t = timeOnce(name, fn)
        // a retry that FAILED measured time-to-error, not the query —
        // it must not become the reported min
        if (!errors.contains(name)) times = times :+ t
        extra += 1
      }
      name -> times
    }
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v.min }
      .mkString("{", ",", "}")
    // per-query noise ratio (max/min over the iterations): a ratio
    // over ~3 marks a timing poisoned by a VM page-fault/GC episode —
    // lets a reader separate machine noise from plan regressions
    // mechanically instead of eyeballing round-over-round diffs
    val noise = results.map { case (k, v) =>
      val r = if (v.min > 0) v.max / v.min else 1.0
      "\"" + k + "\":" + (math.rint(r * 10) / 10)
    }.mkString("{", ",", "}")
    val noisy = results.count { case (_, v) =>
      v.min > 0 && v.max / v.min > 3.0 }
    val errJson = errors.map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_.min).sum else 0.0
    val shaJson = planShas.map { case (k, v) => "\"" + esc(k) + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"noise_ratio":$noise,"noisy_queries":$noisy,"plan_sha":$shaJson,"errors":$errJson,"sf":"$sfDir"}"""
    // persist the FULL per-query map first so every timing stays
    // auditable even if stdout is lost entirely
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")), line)
    catch { case _: Throwable => }
    // stop Spark BEFORE printing the metric line: the driver keeps only
    // a bounded tail of stdout, and shutdown chatter printed after the
    // JSON pushed it out of the kept window in earlier rounds — the
    // metric line must be the LAST thing on stdout, flushed, with
    // nothing after it
    spark.stop()
    println(line)
    System.out.flush()
  }
}
