package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev-only A/B: does persisting a multi-referenced subtree beat
  * letting ReuseExchange/recompute handle it? Old (unpersisted) vs new
  * (persisted) variants of the round-14 text-query candidates,
  * alternating in one JVM so machine drift cancels.
  */
object ProbeReuse {
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
      graft.ops.Dedup.releaseCaches()
    }

    // ---- tfidf: tf referenced 3x ----
    def tfidfVar(persist: Boolean): DataFrame = {
      val docs = Tables.documents(spark, dir)
      val tf0 = docs
        .select($"doc_id", explode(split($"text", " ")).as("token"))
        .groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
      val tf = if (persist)
        graft.ops.Dedup.tracked(tf0.persist(StorageLevel.MEMORY_AND_DISK))
      else tf0
      val n = tf.select($"doc_id").distinct().agg(count(lit(1)).as("n_docs"))
      val df = tf.groupBy($"token").agg(count(lit(1)).as("df"))
      tf.join(broadcast(df), "token").join(broadcast(n))
        .withColumn("tfidf",
          $"tf" * log(($"n_docs" + 1).cast("double") / ($"df" + 1)))
        .filter($"tfidf" > 1.5)
        .select($"doc_id", $"token", $"tf", $"df", round($"tfidf", 6).as("tfidf"))
        .orderBy($"doc_id", $"token")
    }

    // ---- cooccurPmi: dt 3x, df_ 3x, vt 2x ----
    def pmiVar(persist: Boolean): DataFrame = {
      def p(df: DataFrame): DataFrame = if (persist)
        graft.ops.Dedup.tracked(df.persist(StorageLevel.MEMORY_AND_DISK))
      else df
      val dt = p(Tables.documents(spark, dir)
        .select($"doc_id", explode(split($"text", " ")).as("token")).distinct())
      val df_ = p(dt.groupBy($"token").agg(count(lit(1)).as("df")).where($"df" >= 25))
      val n = Tables.documents(spark, dir).select(countDistinct($"doc_id").as("n"))
      val vt = p(dt.join(broadcast(df_.select($"token")), "token")
        .select($"doc_id", $"token"))
      val pairs = vt.select($"doc_id", $"token".as("t1"))
        .join(vt.select($"doc_id", $"token".as("t2")), "doc_id")
        .where($"t1" < $"t2")
        .groupBy($"t1", $"t2").agg(count(lit(1)).as("c12"))
        .where($"c12" >= 10)
      pairs
        .join(broadcast(df_.select($"token".as("t1"), $"df".as("df1"))), "t1")
        .join(broadcast(df_.select($"token".as("t2"), $"df".as("df2"))), "t2")
        .join(broadcast(n))
        .select($"t1", $"t2", $"c12",
          floor(log($"c12".cast("double") * $"n" / ($"df1" * $"df2")) * 1e6)
            .cast("long").as("pmi_micro"))
        .orderBy($"pmi_micro".desc, $"t1", $"t2").limit(100)
    }

    // ---- dedupLines: lines 2x ----
    def linesVar(persist: Boolean): DataFrame = {
      val l0 = Tables.documents(spark, dir)
        .select($"doc_id", posexplode(split($"text", "\\. ")).as(Seq("pos", "line")))
      val lines = if (persist)
        graft.ops.Dedup.tracked(l0.persist(StorageLevel.MEMORY_AND_DISK))
      else l0
      val counts = lines.groupBy($"line")
        .agg(countDistinct($"doc_id").as("n_docs"))
      lines.join(counts.hint("merge"), "line")
        .filter($"n_docs" <= 2)
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_kept"),
          concat_ws(". ", transform(
            sort_array(collect_list(struct($"pos", $"line"))),
            x => x.getField("line"))).as("cleaned"))
        .select($"doc_id", $"n_kept", md5($"cleaned").as("cleaned_md5"))
        .orderBy($"doc_id")
    }

    // ---- bm25: tf (term-filtered aggregate) referenced 2x ----
    def bm25Var(persist: Boolean): DataFrame = {
      val terms = Seq("spark", "vector", "merge")
      val docs = Tables.documents(spark, dir)
      val dl = docs.select($"doc_id", size(split($"text", " ")).cast("long").as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"),
        (sum($"dl").cast("double") / count(lit(1))).as("avgdl"))
      val tf0 = docs
        .select($"doc_id", size(split($"text", " ")).cast("long").as("dl0"),
          explode(split($"text", " ")).as("term"))
        .filter($"term".isin(terms: _*))
        .groupBy($"doc_id", $"term")
        .agg(count(lit(1)).as("tf"), first($"dl0").as("dl"))
      val tf = if (persist)
        graft.ops.Dedup.tracked(tf0.persist(StorageLevel.MEMORY_AND_DISK))
      else tf0
      val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val partial = tf.join(broadcast(df), "term")
        .join(broadcast(stats))
        .select($"doc_id",
          floor(
            log(($"n_docs" - $"df" + 0.5) / ($"df" + 0.5) + 1.0) *
              ($"tf" * 2.2) /
              ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" / $"avgdl")) * 1e6
          ).cast("long").as("sc_micro"))
      partial.groupBy($"doc_id")
        .agg((sum($"sc_micro") / 1e6).as("bm25"))
        .orderBy($"bm25".desc, $"doc_id").limit(50)
    }

    // ---- decontaminate: grams (distinct) referenced 2x ----
    def deconVar(persist: Boolean): DataFrame = {
      val docs = Tables.documents(spark, dir)
        .select($"doc_id", split($"text", " ").as("toks"))
        .filter(size($"toks") >= 8)
      val g0 = docs.select($"doc_id", explode(
          transform(sequence(lit(0), size($"toks") - 8),
            i => concat_ws(" ", slice($"toks", i + 1, lit(8))))).as("g"))
        .distinct()
      val grams = if (persist)
        graft.ops.Dedup.tracked(g0.persist(StorageLevel.MEMORY_AND_DISK))
      else g0
      val eval_ = grams.filter($"doc_id" % 10 === 0)
        .withColumnRenamed("doc_id", "eval_id")
      grams.filter($"doc_id" % 10 =!= 0)
        .join(broadcast(eval_), "g")
        .groupBy($"doc_id")
        .agg(countDistinct($"g").as("n_shared"),
          countDistinct($"eval_id").as("n_eval_docs"))
        .orderBy($"doc_id")
    }

    // ---- vocabGrowth: tok (map-only) referenced 2x ----
    def vocabVar(persist: Boolean): DataFrame = {
      val t0 = Tables.documents(spark, dir)
        .select($"doc_id", explode(split($"text", " ")).as("token"))
      val tok = if (persist)
        graft.ops.Dedup.tracked(t0.persist(StorageLevel.MEMORY_AND_DISK))
      else t0
      val cnt = tok.groupBy($"doc_id").agg(count(lit(1)).as("n_tok"))
      val newc = tok.groupBy($"token").agg(min($"doc_id").as("doc_id"))
        .groupBy($"doc_id").agg(count(lit(1)).as("n_new"))
      val perDoc = cnt.join(newc.hint("merge"), Seq("doc_id"), "left")
        .select($"doc_id", $"n_tok", coalesce($"n_new", lit(0L)).as("n_new"))
        .withColumn("g", lit(1))
      graft.ops.RunningSum.twoLevelMulti(perDoc, Seq("g"), Seq($"doc_id"),
          Seq($"n_tok" -> "tokens_cum", $"n_new" -> "vocab_cum"))
        .select($"doc_id", $"tokens_cum", $"vocab_cum")
        .orderBy($"doc_id")
    }

    // warmups
    noop(tfidfVar(false)); graft.ops.Dedup.releaseCaches()
    noop(tfidfVar(true)); graft.ops.Dedup.releaseCaches()
    noop(bm25Var(true)); graft.ops.Dedup.releaseCaches()
    noop(deconVar(true)); graft.ops.Dedup.releaseCaches()
    noop(vocabVar(true)); graft.ops.Dedup.releaseCaches()
    (1 to 3).foreach { rep =>
      time(s"rep$rep tfidf OLD(no persist)")(noop(tfidfVar(false)))
      time(s"rep$rep tfidf NEW(persist)")(noop(tfidfVar(true)))
      time(s"rep$rep pmi OLD(no persist)")(noop(pmiVar(false)))
      time(s"rep$rep pmi NEW(persist)")(noop(pmiVar(true)))
      time(s"rep$rep lines OLD(no persist)")(noop(linesVar(false)))
      time(s"rep$rep lines NEW(persist)")(noop(linesVar(true)))
      time(s"rep$rep bm25 OLD(no persist)")(noop(bm25Var(false)))
      time(s"rep$rep bm25 NEW(persist)")(noop(bm25Var(true)))
      time(s"rep$rep decon OLD(no persist)")(noop(deconVar(false)))
      time(s"rep$rep decon NEW(persist)")(noop(deconVar(true)))
      time(s"rep$rep vocab OLD(no persist)")(noop(vocabVar(false)))
      time(s"rep$rep vocab NEW(persist)")(noop(vocabVar(true)))
    }
    // plan evidence: does ReuseExchange fire in the OLD tfidf plan?
    val old = tfidfVar(false)
    noop(old)
    val plan = old.queryExecution.executedPlan.toString()
    println("[probe] old tfidf ReusedExchange count: " +
      "ReusedExchange".r.findAllIn(plan).length)
    println("[probe] old tfidf Exchange count: " +
      "Exchange".r.findAllIn(plan).length)
    spark.stop()
  }
}
