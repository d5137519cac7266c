package graft.tools

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only: is the annotate stage per-row or fixed cost? Times the
  * annotate projection at 1x and 10x the corpus, plus each component
  * expression separately, alternating in one JVM.
  */
object ProbeAnnotate {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val docs10 = (1 to 10).map(_ => docs).reduce(_ unionAll _)

    def annotate(d: DataFrame): DataFrame = d
      .withColumn("lang_pred", graft.ops.TextAnalysis.langPredict($"text"))
      .withColumn("quality", graft.ops.TextAnalysis.qualityScore($"text",
        length($"text").cast("long")))
      .withColumn("n_tokens", graft.ops.TextAnalysis.wsTokenCount($"text"))

    // projected form: the Curation.textStages shape
    def annotateProj(d: DataFrame): DataFrame = {
      val TA = graft.ops.TextAnalysis
      val scored = TA.LangMarkers.foldLeft(
          d.withColumn("__toks", TA.tokens($"text"))) {
        case (dd, (l, ws)) =>
          dd.withColumn(s"__s_$l", TA.markerCountFromTokens($"__toks", ws))
      }
      scored
        .withColumn("__ntok", TA.wsTokenCount($"text"))
        .withColumn("__stop", TA.markerCountFromTokens($"__toks", TA.QualityStopwords))
        .withColumn("lang_pred", TA.langPredictFromScores(
          TA.LangMarkers.map { case (l, _) => l -> col(s"__s_$l") }))
        .withColumn("quality", TA.qualityFromCounts($"__ntok", $"__stop",
          TA.punctCount($"text"), TA.upperCount($"text"),
          length($"text").cast("long")))
        .withColumn("n_tokens", $"__ntok")
        .drop((Seq("__toks", "__ntok", "__stop") ++
          TA.LangMarkers.map(m => s"__s_${m._1}")): _*)
    }

    noop(annotate(docs)); noop(annotateProj(docs)) // warm codegen
    (1 to 3).foreach { rep =>
      time(s"rep$rep annotate INLINE 1x")(noop(annotate(docs)))
      time(s"rep$rep annotate PROJ 1x")(noop(annotateProj(docs)))
      time(s"rep$rep annotate INLINE 10x")(noop(annotate(docs10)))
      time(s"rep$rep annotate PROJ 10x")(noop(annotateProj(docs10)))
      time(s"rep$rep scan only 10x")(noop(docs10))
    }
    // sanity: identical values
    val a = annotate(docs).select($"doc_id", $"lang_pred", $"quality", $"n_tokens")
    val b = annotateProj(docs).select($"doc_id", $"lang_pred", $"quality", $"n_tokens")
    println("[probe] value diff rows: " +
      a.exceptAll(b).count() + " / " + b.exceptAll(a).count())
    spark.stop()
  }
}
