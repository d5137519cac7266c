package graft.tools

import graft.{GraftSession, Tables}
import graft.ops.Bfs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only A/B profiler for the q_bfs_levels / q_triangles tail:
  * times the two co-supply-edge derivations (self-join vs per-part
  * array comprehension) alternating in one JVM so machine drift
  * cancels, then the BFS loop on each.
  */
object ProbeBfs {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    import spark.implicits._
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    def joinVariant(s: SparkSession): DataFrame = {
      val ps = Tables.lineitem(s, dir)
        .select($"l_partkey".as("p"), $"l_suppkey".as("sk")).distinct()
      ps.as("a").join(ps.as("b"), $"a.p" === $"b.p" && $"a.sk" < $"b.sk")
        .select($"a.sk".as("u"), $"b.sk".as("v")).distinct()
        .filter(substring(md5(concat_ws(",", $"u", $"v")), 1, 2) < "10")
    }
    def arrayVariant(s: SparkSession): DataFrame =
      graft.queries.Graph.coSupplyEdges(s, dir)

    // calibration: raw scan, distinct, pure-shuffle overhead
    (1 to 3).foreach { rep =>
      val (_, t0) = time(Tables.lineitem(spark, dir).write.format("noop").mode("overwrite").save())
      val (_, t1) = time(Tables.lineitem(spark, dir).select($"l_partkey", $"l_suppkey").write.format("noop").mode("overwrite").save())
      val (_, t2) = time(Tables.lineitem(spark, dir).select($"l_partkey".as("p"), $"l_suppkey".as("sk")).distinct().write.format("noop").mode("overwrite").save())
      val (_, t3) = time(spark.range(600000).select((col("id") % 150000).as("p"), (col("id") % 40000).as("sk")).distinct().write.format("noop").mode("overwrite").save())
      println(f"[probe] rep$rep scanAll=$t0%.2f scan2=$t1%.2f distinct=$t2%.2f synthDistinct=$t3%.2f")
    }
    // warmup both
    joinVariant(spark).write.format("noop").mode("overwrite").save()
    arrayVariant(spark).write.format("noop").mode("overwrite").save()
    (1 to 4).foreach { rep =>
      val (_, tj) = time(joinVariant(spark).write.format("noop").mode("overwrite").save())
      val (_, ta) = time(arrayVariant(spark).write.format("noop").mode("overwrite").save())
      println(f"[probe] rep$rep edges join=$tj%.2f array=$ta%.2f")
    }
    // BFS loop alone, on a persisted edge frame (derivation excluded):
    // eager checkpoint-then-count (2 jobs/round) vs lazy checkpoint
    // materialized by the count action (1 job/round), alternating reps
    // in ONE JVM so machine drift cancels
    val e = arrayVariant(spark)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.count()
    val src = e.agg(min($"u")).as[Option[Long]].head().get
    def run(eager: Boolean): (Long, Double) = {
      val (out, t) = time(Bfs.levelsImpl(e, "u", "v", src, maxDepth = 6,
        broadcastFrontierMax = 4L << 20, eagerCkpt = eager))
      (out.count(), t)
    }
    run(eager = true); run(eager = false) // warmup both
    (1 to 4).foreach { rep =>
      val (ne, te) = run(eager = true)
      val (nl, tl) = run(eager = false)
      assert(ne == nl, s"variants disagree: $ne vs $nl")
      println(f"[probe] rep$rep bfs eager=$te%.2f lazy=$tl%.2f visited=$ne")
    }
    spark.stop()
  }
}
