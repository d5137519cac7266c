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
