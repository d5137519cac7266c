package graft.tools

/** Dev-only: print the NORMALIZED plan text fingerprint() hashes for
  * the named queries — run twice and diff to find run-varying tokens
  * the normalizer misses.
  */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    // optional warm-pollution: run some cache-heavy queries first so
    // session-sequential ids (RDD/cache/broadcast) advance, as in a
    // full bench run — flapping here = order-dependent tokens left
    if (sys.env.contains("GRAFT_PROBE_WARM")) {
      Seq("dedup_minhash_lsh", "q_sql_catalog", "q_bpe").foreach { w =>
        try graft.SparkEntry.queries(w)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        graft.ops.Dedup.releaseCaches()
      }
    }
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val raw = df.queryExecution.executedPlan.toString()
      val norm = PlanAudit.normalizedForTest(raw)
      println(s"=== $n ===")
      println(norm)
    }
    spark.stop()
  }
}
