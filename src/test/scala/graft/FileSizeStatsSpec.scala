package graft

import graft.etl._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.DeltaLiteFileIndex

import java.nio.file.Files

/** The commit log records each data file's byte size at write time, so
  * scan planning (readIndexed / catalog reads) builds its FileIndex
  * with ZERO per-file getFileStatus calls — at millions of live files
  * a per-file stat is O(files) metadata-store round trips per table
  * open. The fallback counter proves the warm path never stats.
  */
class FileSizeStatsSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def realLen(p: String): Long =
    new java.io.File(new java.net.URI(
      if (p.startsWith("file:")) p else "file://" + p)).length()

  test("append records true byte sizes; indexed scan opens with zero stats") {
    import spark.implicits._
    val dir = tmp("graft-size")
    val t = DeltaLite(spark, dir, statsKey = "k")
    t.appendClustered((0L until 400L).map(k => (k, s"v$k")).toDF("k", "v"),
      numFiles = 8)

    val sizes = t.liveFileSizes()
    assert(sizes.size == 8)
    assert(sizes.forall(_._2.isDefined), "every entry carries a size")
    sizes.foreach { case (p, sz) =>
      assert(sz.get == realLen(p), s"recorded size mismatches fs for $p")
    }

    // warm open + filtered scan: no per-file stat fallback fires
    val before = DeltaLiteFileIndex.fallbackStats.get()
    val rows = t.readIndexed().filter($"k" === 257L).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(257L))
    assert(DeltaLiteFileIndex.fallbackStats.get() == before,
      "indexed scan called getFileStatus despite log-recorded sizes")
  }

  test("sizes survive restats, checkpoint splice and shallow clone") {
    import spark.implicits._
    val dir = tmp("graft-size-surv")
    val t = DeltaLite(spark, dir, statsKey = "k")
    t.append((0L until 100L).map(k => (k, k * 2)).toDF("k", "x"))
    t.append((100L until 200L).map(k => (k, k * 2)).toDF("k", "x"))

    t.restats(Seq("k", "x"))
    assert(t.liveFileSizes().forall(_._2.isDefined), "restats dropped sizes")

    t.checkpointNow()
    t.cleanLog()
    val reopened = DeltaLite(spark, dir, statsKey = "k")
    val reSizes = reopened.liveFileSizes()
    assert(reSizes.nonEmpty && reSizes.forall(_._2.isDefined),
      "checkpoint round-trip dropped sizes")
    reSizes.foreach { case (p, sz) => assert(sz.get == realLen(p)) }

    val clone = t.shallowCloneTo(tmp("graft-size-clone"))
    assert(clone.liveFileSizes().forall(_._2.isDefined),
      "shallow clone dropped sizes")
  }

  test("convert adopts sizes from the source listing; detail needs no stats") {
    import spark.implicits._
    val src = tmp("graft-size-src")
    (0 until 50).map(i => (i, s"d$i")).toDF("id", "s")
      .repartition(3).write.mode("overwrite").parquet(src)
    val t = DeltaLite.convert(spark, src, tmp("graft-size-conv"))
    val sizes = t.liveFileSizes()
    assert(sizes.size == 3 && sizes.forall(_._2.isDefined))
    val detailBytes = t.detail().select("size_bytes").as[Long].head()
    assert(detailBytes == sizes.map(_._2.get).sum)
  }

  test("partitioned writes record per-leaf-file sizes under the hive dirs") {
    import spark.implicits._
    val dir = tmp("graft-size-part")
    val t = new DeltaLite(spark, dir, partitionBy = Seq("p"))
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("k", "p"))
    val sizes = t.liveFileSizes()
    assert(sizes.nonEmpty && sizes.forall(_._2.isDefined))
    sizes.foreach { case (p, sz) => assert(sz.get == realLen(p)) }
  }
}
