package graft.tools

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev-only A/B: single-step-per-action (SHIPPED — Components.scala's
  * loop) vs two-steps-per-action (the REJECTED batch variant, measured
  * slower: 3.6 vs 2.5 s), alternating reps in one JVM.
  */
object ProbeCc {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def oldCc(pairs: DataFrame, maxRounds: Int = 20): DataFrame = {
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var labels = edges.select(col("src").as("v")).distinct()
        .withColumn("label", col("v"))
        .localCheckpoint(true)
      var round = 0
      var converged = false
      while (!converged && round < maxRounds) {
        val nbrMin = edges
          .join(labels.withColumnRenamed("v", "dst")
            .withColumnRenamed("label", "dst_label"), Seq("dst"))
          .groupBy(col("src").as("v"))
          .agg(min(col("dst_label")).as("nbr_label"))
        val next = labels.join(nbrMin, Seq("v"), "left")
          .select(col("v"),
            least(col("label"), coalesce(col("nbr_label"), col("label")))
              .as("next_label"),
            (coalesce(col("nbr_label"), col("label")) < col("label"))
              .as("changed"))
          .localCheckpoint(true)
        val changed = next.filter(col("changed")).count()
        labels = next.select(col("v"), col("next_label").as("label"))
        converged = changed == 0
        round += 1
      }
      edges.unpersist(false)
      labels.select(col("v").as("vertex"), col("label").as("component"))
    }

    val input = Tables.documents(spark, dir)
    val candidates = graft.ops.Dedup.minhashPairs(input, "text", "doc_id",
      threshold = 0.3).select("id_a", "id_b")
    val pairs = graft.ops.Dedup.ngramJaccard(input, candidates, "text", "doc_id")
      .filter(col("jaccard") >= 0.8)
      .persist(StorageLevel.MEMORY_AND_DISK)
    println("[probe] pair rows: " + pairs.count())
    // warmups
    noop(oldCc(pairs).orderBy("vertex"))
    noop(graft.ops.Components.connectedComponents(pairs, "id_a", "id_b").orderBy("vertex"))
    (1 to 3).foreach { rep =>
      time(s"rep$rep cc OLD(1 step/action)")(noop(oldCc(pairs).orderBy("vertex")))
      time(s"rep$rep cc NEW(2 steps/action)")(noop(
        graft.ops.Components.connectedComponents(pairs, "id_a", "id_b").orderBy("vertex")))
    }
    // equivalence
    val a = oldCc(pairs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = graft.ops.Components.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[probe] identical: ${a == b} (${a.size} labels)")
    spark.stop()
  }
}
