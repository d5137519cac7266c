package graft.tools

import graft.Tables
import org.apache.spark.sql.DataFrame

/** Dev-only stage profiler for the curate/pretrain pipeline and the
  * other round-14 hot queries: times each composed stage with the noop
  * sink, alternating reps in one JVM so machine drift cancels, and can
  * print the POST-AQE executed plan of any query
  * (`GRAFT_PROBE_FINAL_PLAN=name`).
  */
object ProbeCurate {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.ops.Dedup.releaseCaches()
    }

    sys.env.get("GRAFT_PROBE_FINAL_PLAN").foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      noop(df)
      println(s"=== $n FINAL PLAN ===")
      println(df.queryExecution.executedPlan.toString().take(20000))
      graft.ops.Dedup.releaseCaches()
      spark.stop()
      return
    }

    val docs = Tables.documents(spark, dir)
    // warmup
    noop(docs)
    (1 to 3).foreach { rep =>
      time(s"rep$rep docs scan")(noop(docs))
      time(s"rep$rep annotate") {
        import org.apache.spark.sql.functions._
        noop(docs
          .withColumn("lang_pred", graft.ops.TextAnalysis.langPredict(col("text")))
          .withColumn("quality", graft.ops.TextAnalysis.qualityScore(col("text"),
            length(col("text")).cast("long")))
          .withColumn("n_tokens", graft.ops.TextAnalysis.wsTokenCount(col("text"))))
      }
      time(s"rep$rep exactSurvivors") {
        noop(graft.ops.Dedup.exactSurvivors(docs, "text", "doc_id"))
      }
      time(s"rep$rep minhashPairs") {
        noop(graft.ops.Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.3))
      }
      time(s"rep$rep ngramJaccard(on pairs)") {
        val cands = graft.ops.Dedup.minhashPairs(docs, "text", "doc_id",
          threshold = 0.3).select("id_a", "id_b")
        noop(graft.ops.Dedup.ngramJaccard(docs, cands, "text", "doc_id"))
      }
      time(s"rep$rep curate(full)") {
        noop(graft.ops.Curation.curate(docs, "text", "doc_id",
          minQuality = 0.3, langs = Seq("en", "de", "fr", "es"), jaccard = 0.8))
      }
      time(s"rep$rep pretrain(full)") {
        noop(graft.SparkEntry.queries("pipeline_pretrain")(spark, dir))
      }
    }
    spark.stop()
  }
}
