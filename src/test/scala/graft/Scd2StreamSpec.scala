package graft

import graft.etl.{DeltaLite, Scd2}
import graft.streaming.DeltaSink
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming SCD2 load: per-batch merge via file-granular upsert is
  * exactly-once across replays and equals the one-shot batch build.
  */
class Scd2StreamSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def changes(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.map { case (k, t, v) => (k, ts(t), v) }.toDF("k", "ts", "status")
  }

  test("scd2Writer: replay-safe, key-granular, equals the batch build") {
    val t = DeltaLite(spark,
      java.nio.file.Files.createTempDirectory("graft-scd2").toString,
      statsKey = "k")
    val writer = DeltaSink.scd2Writer(t, "scd", "k", "ts", Seq("status"))

    val b0 = changes(
      (1L, "2024-01-01 00:00:00", "a"),
      (2L, "2024-01-01 06:00:00", "x"),
      (3L, "2024-01-02 00:00:00", "p"))
    val b1 = changes(
      (1L, "2024-01-03 00:00:00", "b"),
      (2L, "2024-01-03 06:00:00", "x"), // no-op change: equals current
      (4L, "2024-01-03 12:00:00", "new"))
    val b2 = changes(
      (1L, "2024-01-05 00:00:00", "c"),
      (4L, "2024-01-06 00:00:00", "new2"))

    writer(b0, 0L)
    writer(b0, 0L) // immediate replay: must not commit again
    val vAfterReplay = t.latestVersion
    writer(b1, 1L)
    writer(b0, 0L) // late replay after a newer commit: no-op
    writer(b2, 2L)
    assert(t.lastTxn("scd").contains(2L))

    val want = Scd2.build(b0.unionByName(b1).unionByName(b2),
      "k", "ts", Seq("status"))
      .collect().map(_.toSeq).toSet
    val got = t.read()
      .select("k", "valid_from", "valid_to", "version", "is_current", "status")
      .collect().map(_.toSeq).toSet
    assert(got == want)
    assert(vAfterReplay.exists(v => t.latestVersion.exists(_ > v)))

    // key granularity: key 3 never appeared after batch 0, so its row
    // survives every later merge byte-identically
    val k3 = t.read().filter(col("k") === 3L).collect().toSeq
    assert(k3.map(r => (r.getAs[Long]("k"), r.getAs[Boolean]("is_current"),
      r.getAs[String]("status"))) == Seq((3L, true, "p")))
  }
}
