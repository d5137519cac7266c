package graft

import org.apache.spark.sql.functions.col

import graft.etl.DeltaLite

/** Protocol feature gates (VERDICT r7 item 2): commit records and
  * checkpoints carry the features their correct interpretation
  * requires; a build that doesn't know a REQUIRED feature fails
  * loudly with guidance instead of silently misreading (reader
  * features) or corrupting invariants (writer features). Pre-gate
  * logs carry no stamps and keep opening unchanged.
  */
class FeatureGateSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-feat").toString

  private def logText(root: String, v: Int): String = {
    val src = scala.io.Source.fromFile(s"$root/_log/$v.json")
    try src.mkString finally src.close()
  }

  private def writeLog(root: String, v: Int, body: String): Unit = {
    val w = new java.io.FileWriter(s"$root/_log/$v.json")
    try w.write(body) finally w.close()
  }

  test("plain appends carry no stamps; DV and colmap commits stamp reader features") {
    val root = tmp()
    val t = new DeltaLite(spark, root, Some("k"))
    t.append(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"))
    assert(!logText(root, 0).contains("rfeat"),
      "a featureless append must not stamp requirements")
    t.deleteWhere(col("k") === 2)
    assert(logText(root, 1).contains("\"rfeat\":\"dv\""),
      "a DV commit must stamp the dv reader feature")
    t.renameColumn("v", "w")
    assert(logText(root, 2).contains("colmap"),
      "a mapping commit must stamp the colmap reader feature")
    // this build supports both — the table keeps reading fine
    assert(t.read().count() == 2)
  }

  test("a log stamped with an unknown READER feature refuses to open with guidance") {
    val root = tmp()
    val t = new DeltaLite(spark, root)
    t.append(Seq((1, "a")).toDF("k", "v"))
    // hand-stamp a future build's record: same content, future rfeat
    val future = logText(root, 0)
      .replace("\"version\":\"0\"", "\"version\":\"1\"")
      .replace("\"schema\":", "\"rfeat\":\"rowtracking-v9\",\"schema\":")
    writeLog(root, 1, future)
    val t2 = new DeltaLite(spark, root)
    val e = intercept[IllegalStateException](t2.read())
    assert(e.getMessage.contains("rowtracking-v9"))
    assert(e.getMessage.contains("reader feature"))
    assert(e.getMessage.contains("upgrade"))
    // writes must refuse too — they replay the log to pick a version
    val e2 = intercept[IllegalStateException](
      t2.append(Seq((2, "b")).toDF("k", "v")))
    assert(e2.getMessage.contains("rowtracking-v9"))
  }

  test("a log stamped with an unknown WRITER feature still reads but refuses writes") {
    val root = tmp()
    val t = new DeltaLite(spark, root)
    t.append(Seq((1, "a")).toDF("k", "v"))
    val future = logText(root, 0)
      .replace("\"version\":\"0\"", "\"version\":\"1\"")
      .replace("\"schema\":", "\"wfeat\":\"ident-epoch-v4\",\"schema\":")
    writeLog(root, 1, future)
    val t2 = new DeltaLite(spark, root)
    // reading is safe — rows replay without the writer invariant
    assert(t2.read().count() == 2)
    val e = intercept[IllegalStateException](
      t2.append(Seq((3, "c")).toDF("k", "v")))
    assert(e.getMessage.contains("ident-epoch-v4"))
    assert(e.getMessage.contains("writer feature"))
  }

  test("checkpoints carry the feature union so stamps survive cleanLog") {
    val root = tmp()
    val t = new DeltaLite(spark, root, Some("k"),
      checkpointInterval = 1000)
    (0 until 3).foreach(i => t.append(Seq((i, s"v$i")).toDF("k", "v")))
    t.deleteWhere(col("k") === 1) // stamps dv on v3
    (4 until 6).foreach(i => t.append(Seq((i, s"v$i")).toDF("k", "v")))
    t.checkpointNow()
    t.cleanLog() // the stamped v3 record is gone; the checkpoint remains
    val ckpt = { // v2: stamps ride the small meta blob
      val src = scala.io.Source.fromFile(s"$root/_log/5.checkpoint.meta.json")
      try src.mkString finally src.close()
    }
    assert(ckpt.contains("\"rfeat\":\"dv\""),
      "the checkpoint must union the trimmed records' feature stamps")
    // a fresh open replays through the checkpoint — still supported here
    val t2 = new DeltaLite(spark, root)
    assert(t2.read().count() == 4)
  }

  test("detail() surfaces the table's required features (what an older build checks first)") {
    val root = tmp()
    val t = new DeltaLite(spark, root, Some("k"))
    t.append(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    val before = t.detail().collect().head
    assert(before.getAs[String]("reader_features") == "")
    t.deleteWhere(col("k") === 2)
    t.renameColumn("v", "w")
    val d = t.detail().collect().head
    assert(d.getAs[String]("reader_features") == "colmap,dv")
  }

  test("a future feature stamped in a CHECKPOINT refuses to open too (post-cleanLog path)") {
    val root = tmp()
    val t = new DeltaLite(spark, root, checkpointInterval = 1000)
    (0 until 3).foreach(i => t.append(Seq((i, s"v$i")).toDF("k", "v")))
    t.checkpointNow()
    t.cleanLog()
    // hand-stamp the surviving checkpoint META with a future reader feature
    val ckptPath = s"$root/_log/2.checkpoint.meta.json"
    val src = scala.io.Source.fromFile(ckptPath)
    val body = try src.mkString finally src.close()
    val w = new java.io.FileWriter(ckptPath)
    try w.write(body.replace("\"schema\":",
      "\"rfeat\":\"vectored-io-v12\",\"schema\":"))
    finally w.close()
    val t2 = new DeltaLite(spark, root)
    val e = intercept[IllegalStateException](t2.read())
    assert(e.getMessage.contains("vectored-io-v12"))
    assert(e.getMessage.contains("reader feature"))
  }

  test("identity/generated/partitioned tables stamp writer features") {
    val root = tmp()
    val t = new DeltaLite(spark, root, partitionBy = Seq("p"))
    t.append(Seq((1, "x"), (2, "y")).toDF("k", "p"))
    assert(logText(root, 0).contains("\"wfeat\":\"parts\""))
    assert(!logText(root, 0).contains("rfeat"),
      "hive layout reads fine without the feature — writer-only stamp")
    val t2 = new DeltaLite(spark, root)
    assert(t2.read().count() == 2)
  }
}
