package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev-only A/B profiler for the PageRank loop: the shipped
  * `PageRank.run` vs the historical per-round eager-checkpoint loop,
  * alternating reps in one JVM so machine drift cancels.
  */
object ProbePr {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def edges(s: SparkSession): DataFrame =
      Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_suppkey")
        .join(Tables.orders(s, dir).select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .select($"l_suppkey".cast("long").as("src"),
          ($"o_custkey" + lit(100000L)).as("dst"))
        .distinct()

    // the historical loop: eager checkpoint every round
    def oldRun(e0: DataFrame, iters: Int): DataFrame = {
      val e = e0.select(col("src"), col("dst")).persist(StorageLevel.MEMORY_AND_DISK)
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = nodes.count()
      val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      val eo = e.join(outdeg, Seq("src")).persist(StorageLevel.MEMORY_AND_DISK)
      val base = graft.ops.PageRank.Scale * 15 / 100 / n
      var pr = nodes.withColumn("pr", lit(graft.ops.PageRank.Scale / n))
        .localCheckpoint(true)
      for (_ <- 1 to iters) {
        val inflow = eo
          .join(pr.withColumnRenamed("node", "src"), Seq("src"))
          .select(col("dst").as("node"), expr("pr div outdeg").as("contrib"))
          .groupBy(col("node")).agg(sum(col("contrib")).as("inflow"))
        pr = nodes.join(inflow, Seq("node"), "left")
          .select(col("node"),
            (lit(base) + expr("coalesce(inflow, 0L) * 85 div 100")).as("pr"))
          .localCheckpoint(true)
      }
      e.unpersist(false); eo.unpersist(false); nodes.unpersist(false)
      pr
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warmups
    noop(oldRun(edges(spark), 3).orderBy($"pr".desc, $"node").limit(100))
    noop(graft.ops.PageRank.run(edges(spark), 3).orderBy($"pr".desc, $"node").limit(100))
    (1 to 3).foreach { rep =>
      time(s"rep$rep old(eager-per-round)") {
        noop(oldRun(edges(spark), 3).orderBy($"pr".desc, $"node").limit(100))
      }
      time(s"rep$rep new(batched)") {
        noop(graft.ops.PageRank.run(edges(spark), 3).orderBy($"pr".desc, $"node").limit(100))
      }
    }
    spark.stop()
  }
}
