package graft

import org.apache.spark.sql.{Row, SparkSession}

/** ADOPTION-scale knob measurement (SURVEY §22's discipline): builds a
  * synthetic checkpoint-backed partitioned Delta source with N add
  * rows (metadata-only — adoption never opens a data file, so the
  * fixture needs no bytes; built DISTRIBUTED like the 100k-file spec)
  * and times [[graft.etl.DeltaLite.convertFromDelta]] plus one
  * partition-filtered planning probe on the adopted table. Prints one
  * JSON line with the wall seconds AND the driver-row counters
  * (jsonEntriesRendered / entriesCollected), so the seconds-per-file
  * constant and the bounded-driver claim are pinned by the artifact,
  * not argued.
  *
  * usage: `runMain graft.AdoptKnobs <nFiles> [parts]`
  */
object AdoptKnobs {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AdoptKnobs <nFiles> [parts]")
    val n = args(0).toLong
    val parts = if (args.length > 1) args(1).toInt else 200
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("adopt-knobs")
      .toString
    val dir = s"$base/src"
    val schemaString = org.apache.spark.sql.types.StructType.fromDDL(
      "k bigint, v string, p string").json
    val addT = org.apache.spark.sql.types.StructType.fromDDL(
      "path string, partitionValues map<string,string>, size long, " +
        "modificationTime long, dataChange boolean, stats string")
    val metaT = org.apache.spark.sql.types.StructType.fromDDL(
      "id string, schemaString string, partitionColumns array<string>, " +
        "configuration map<string,string>")
    val protoT = org.apache.spark.sql.types.StructType.fromDDL(
      "minReaderVersion int, minWriterVersion int")
    val cpT = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("add", addT),
      org.apache.spark.sql.types.StructField("metaData", metaT),
      org.apache.spark.sql.types.StructField("protocol", protoT)))
    val head: Seq[Row] = Seq(
      Row(null, null, Row(1, 2)),
      Row(null, Row("adopt-knobs", schemaString, Seq("p"),
        Map.empty[String, String]), null))
    val addRows = spark.range(n).rdd.map { i =>
      val part = s"p${i % parts}"
      Row(Row(s"$part/f$i.parquet", Map("p" -> part), 1000L, 0L, true,
        s"""{"numRecords":10,"minValues":{"k":${i * 10}},""" +
          s""""maxValues":{"k":${i * 10 + 9}}}"""), null, null)
    }
    val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
    val cpStage = s"$base/cp"
    spark.createDataFrame(
      spark.sparkContext.parallelize(head, 1).union(addRows), cpT)
      .write.mode("overwrite").parquet(cpStage)
    val partsF = new java.io.File(cpStage).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    partsF.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.copy(f.toPath, new java.io.File(log,
        f"${0L}%020d.checkpoint.${i + 1}%010d.${partsF.length}%010d" +
          ".parquet").toPath)
    }
    java.nio.file.Files.write(new java.io.File(log,
      f"${0L}%020d.json").toPath, "\n".getBytes("UTF-8"))

    val t0 = System.nanoTime()
    val t = graft.etl.DeltaLite.convertFromDelta(spark, dir, s"$base/root")
    val adoptSecs = (System.nanoTime() - t0) / 1e9
    val rendered = t.jsonEntriesRendered.get()
    val collectedAfterAdopt = t.entriesCollected.get()
    // planning probe: one partition-filtered scan plan over the
    // adopted table — the lazy index must collect O(partition) rows
    val t1 = System.nanoTime()
    val q = t.readIndexed().filter(
      org.apache.spark.sql.functions.col("p") === "p7")
    val planned = q.queryExecution.executedPlan.collectLeaves().map {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.totalNumberOfFiles
      case _ => 0L
    }.sum
    val planSecs = (System.nanoTime() - t1) / 1e9
    val collectedForPlan = t.entriesCollected.get() - collectedAfterAdopt
    val line = s"""{"metric":"adopt_knobs","n_files":$n,""" +
      s""""parts":$parts,"adopt_secs":$adoptSecs,""" +
      s""""json_entries_rendered":$rendered,""" +
      s""""entries_collected_adopt":$collectedAfterAdopt,""" +
      s""""plan_secs":$planSecs,"planned_files":$planned,""" +
      s""""entries_collected_plan":$collectedForPlan}"""
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { out =>
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line)
      catch { case _: Throwable => }
    }
    spark.stop()
    println(line)
    System.out.flush()
  }
}
