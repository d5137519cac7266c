package graft

import org.apache.spark.sql.SparkSession

/** Scale-knob measurement main (SURVEY §21): times the two
  * LSH-candidate-bound similarity keys — `knn_graph` and
  * `dedup_embedding` — at a CONFIGURABLE (planes, tables) over a
  * [[GenData]] family dir, so the production knob (planes grows with
  * corpus size to keep per-bucket candidate volume bounded; every
  * plane halves expected bucket size) is MEASURED, not argued. Same
  * measurement discipline as [[Bench]]: noop-format write
  * materializes every row, two iterations, min reported. Prints one
  * JSON line and writes it to `SPARK_GRAFT_BENCH_OUT` when set.
  *
  * usage: `runMain graft.ScaleKnobs <sfDir> <planes> <tables>`
  */
object ScaleKnobs {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleKnobs <sfDir> <planes> <tables>")
    val dir = args(0)
    val planes = args(1).toInt
    val tables = args(2).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeOnce(f: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      graft.ops.Dedup.releaseCaches()
      secs
    }
    def best(f: => org.apache.spark.sql.DataFrame): (Double, Long) = {
      val t = (0 until 2).map(_ => timeOnce(f)).min
      val rows = f.count() // untimed: the output-volume fact
      graft.ops.Dedup.releaseCaches()
      (t, rows)
    }
    val (tKnn, nKnn) = best(
      graft.queries.Vectors.knnGraphKnobs(spark, dir, planes, tables))
    val (tDed, nDed) = best(
      graft.queries.Text.dedupEmbeddingKnobs(spark, dir, planes, tables))
    val line = s"""{"metric":"scale_knobs","sf":"$dir","planes":$planes,""" +
      s""""tables":$tables,"queries":{"knn_graph":$tKnn,""" +
      s""""dedup_embedding":$tDed},"rows":{"knn_graph":$nKnn,""" +
      s""""dedup_embedding":$nDed}}"""
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { out =>
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line)
      catch { case _: Throwable => }
    }
    spark.stop()
    println(line)
    System.out.flush()
  }
}
