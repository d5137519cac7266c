package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Dev-only: per-statement timing of the q_dml_sql /
  * q_session_catalog_sql flows, plus round counts of the
  * connected-components loop on the dedup_clusters pair set.
  */
object ProbeDml {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // per-job timing (submit→end wall clock) for one statement
    val jobLog = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobLog.put(js.jobId, (js.time, js.stageInfos.map(_.numTasks).sum))
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobLog.get(je.jobId)).foreach { case (t0, ntasks) =>
            println(f"[job] id=${je.jobId} ${(je.time - t0) / 1e3}%.2fs tasks=$ntasks")
          }
        }
      })
    val s: SparkSession = spark
    s.conf.set("spark.sql.catalog.graft",
      classOf[graft.catalog.GraftCatalog].getName)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.gold")
    (1 to 2).foreach { rep =>
      val tbl = s"dmlprobe_$rep"
      time(s"rep$rep drop")(s.sql(s"DROP TABLE IF EXISTS graft.gold.$tbl"))
      Tables.events(s, dir).createOrReplaceTempView("graft_dml_src")
      time(s"rep$rep ctas")(s.sql(s"CREATE TABLE graft.gold.$tbl AS " +
        "SELECT event_id, user_id, event_type, value FROM graft_dml_src"))
      time(s"rep$rep update")(s.sql(s"UPDATE graft.gold.$tbl SET event_type = 'viewed', " +
        "value = value * 2 WHERE event_type = 'view' AND user_id < 20"))
      time(s"rep$rep delete")(s.sql(s"DELETE FROM graft.gold.$tbl " +
        "WHERE event_type = 'click' AND user_id < 10"))
      time(s"rep$rep merge")(s.sql(
        s"""MERGE INTO graft.gold.$tbl t USING
           |  (SELECT event_id, value FROM graft_dml_src
           |   WHERE event_type = 'purchase' AND user_id < 5) s
           |ON t.event_id = s.event_id
           |WHEN MATCHED THEN UPDATE SET value = t.value + s.value""".stripMargin))
      time(s"rep$rep agg")(s.sql(
        s"""SELECT event_type, COUNT(*) AS n_events,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           |FROM graft.gold.$tbl
           |GROUP BY event_type
           |ORDER BY event_type""".stripMargin)
        .write.format("noop").mode("overwrite").save())
    }
    // components round count on the real dedup pair set
    import org.apache.spark.sql.functions._
    val input = Tables.documents(s, dir)
    val candidates = graft.ops.Dedup.minhashPairs(input, "text", "doc_id",
      threshold = 0.3).select("id_a", "id_b")
    val pairs = graft.ops.Dedup.ngramJaccard(input, candidates, "text", "doc_id")
      .filter(col("jaccard") >= 0.8)
      .persist()
    println("[probe] pair rows: " + pairs.count())
    time("cc loop") {
      graft.ops.Components.connectedComponents(pairs, "id_a", "id_b")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
