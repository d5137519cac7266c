package graft.tools

/** Dev-only: write `.explain("formatted")` for the named queries (or
  * every query) to one file per query under an output directory — the
  * audit-trail artifact the optimization rounds commit as
  * plans/rNN/<query>_{before,after}.txt.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [names...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/plans")
    val suffix = args.lift(2).getOrElse("before")
    val names = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val selected =
      if (names.nonEmpty) names.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    selected.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"), txt)
        println(s"[plandump] $n ok")
      } catch {
        case e: Throwable =>
          println(s"[plandump] $n FAILED: ${e.getMessage}")
      } finally graft.ops.Dedup.releaseCaches()
    }
    spark.stop()
  }
}
