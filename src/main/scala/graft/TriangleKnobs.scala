package graft

import org.apache.spark.sql.SparkSession

/** Triangle-density knob measurement (SURVEY §21's discipline): times
  * the degree-ordered triangle census at a CONFIGURABLE edge-thinning
  * threshold over the same tables, so the time-vs-wedge trend rests on
  * several densities of the SAME graph rather than two scale ratios —
  * and the thinning knob a 100 TB run would turn (the co-occurrence
  * graph densifies toward a clique with scale) is MEASURED, not
  * argued. Prints one JSON line with the census counts alongside the
  * seconds, so time/wedge is computable from the artifact alone.
  *
  * usage: `runMain graft.TriangleKnobs <sfDir> <keepHex>` — keepHex is
  * the md5-prefix threshold ("08" = 1/32, "10" = 1/16 = the oracled
  * default, "20" = 1/8).
  */
object TriangleKnobs {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: TriangleKnobs <sfDir> <keepHex>")
    val dir = args(0)
    val keepHex = args(1)
    require(keepHex.matches("[0-9a-f]{2}"),
      s"keepHex must be two lowercase hex digits, got '$keepHex'")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeOnce(): (Double, org.apache.spark.sql.Row) = {
      val t0 = System.nanoTime()
      val row = graft.queries.Graph
        .qTrianglesKnob(spark, dir, keepHex).collect()(0)
      val secs = (System.nanoTime() - t0) / 1e9
      graft.ops.Dedup.releaseCaches()
      (secs, row)
    }
    val runs = (0 until 2).map(_ => timeOnce())
    val secs = runs.map(_._1).min
    val r = runs.head._2
    val line = s"""{"metric":"triangle_knobs","sf":"$dir",""" +
      s""""keep_hex":"$keepHex","secs":$secs,""" +
      s""""n_nodes":${r.getLong(0)},"n_edges":${r.getLong(1)},""" +
      s""""n_wedges":${r.getLong(2)},"n_triangles":${r.getLong(3)}}"""
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { out =>
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line)
      catch { case _: Throwable => }
    }
    spark.stop()
    println(line)
    System.out.flush()
  }
}
