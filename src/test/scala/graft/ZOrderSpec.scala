package graft

import graft.ops.ZOrder
import graft.queries.Events
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: exact bit placement and range clamp") {
    val rows = Seq((5L, 3L), (0L, 0L), (1L, 0L), (0L, 1L), (-7L, 99999L))
      .toDF("a", "b")
      .select(ZOrder.interleave(col("a"), col("b"), bits = 8).as("z"))
      .collect().map(_.getLong(0))
    // a=101, b=011 -> z bits (b1 a1 .. b0 a0) = 0b011011 + a bit2 at pos 4
    // a=5 (101), b=3 (011): pos0=a0=1, pos1=b0=1, pos2=a1=0, pos3=b1=1,
    // pos4=a2=1, pos5=b2=0 -> 0b011011 = 27
    assert(rows(0) == 27L)
    assert(rows(1) == 0L)
    assert(rows(2) == 1L)  // a bit 0 -> position 0
    assert(rows(3) == 2L)  // b bit 0 -> position 1
    // negative a clamps to 0; b clamps to 255 (bits=8) -> z = interleave(0, 255)
    val expected = (0 until 8).map(i => 1L << (2 * i + 1)).sum
    assert(rows(4) == expected)
  }

  test("z-layout: one layout bounds BOTH dimensions; a linear sort bounds one") {
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString
    val ev = Tables.events(spark, sf01)
      .withColumn("day_idx",
        datediff($"ts".cast("date"), lit("2024-01-01").cast("date")))
    val nFiles = 64
    ZOrder.clusterWrite(ev, s"$tmp/z", $"user_id", $"day_idx", nFiles, bits = 12)
    // linear layout: same file count, sorted by user_id only — the
    // single-dimension clustering it competes against
    ev.repartitionByRange(nFiles, $"user_id").sortWithinPartitions($"user_id")
      .write.mode("overwrite").parquet(s"$tmp/linear")

    def overlapping(path: String)(box: org.apache.spark.sql.Column): (Long, Long) = {
      val df = spark.read.parquet(path)
      val stats = ZOrder.fileStats(df, "user_id")
        .join(ZOrder.fileStats(df, "day_idx"), "file")
      (stats.filter(box).count(), stats.count())
    }
    // predicate on the NON-sort dimension: day_idx in [9,14]. The
    // user-sorted layout cannot skip anything (every user slice spans
    // the month); the Z-layout bounds day per file.
    val dayBox = $"min_day_idx" <= 14 && $"max_day_idx" >= 9
    val (zDay, zTotal) = overlapping(s"$tmp/z")(dayBox)
    val (lDay, lTotal) = overlapping(s"$tmp/linear")(dayBox)
    assert(zTotal == nFiles && lTotal == nFiles)
    assert(lDay >= (nFiles * 9) / 10, s"linear-by-user should span days, hit $lDay")
    assert(zDay * 2 <= lDay, s"zorder day-slab hit $zDay vs linear $lDay")
    // predicate on the sort dimension still prunes under Z too
    val userBox = $"min_user_id" <= 80 && $"max_user_id" >= 40
    val (zUser, _) = overlapping(s"$tmp/z")(userBox)
    assert(zUser < nFiles, s"zorder user-range should skip files, hit $zUser")
    // and the 2-D box is at least as selective as its day slab
    val (zBoth, _) = overlapping(s"$tmp/z")(dayBox && userBox)
    assert(zBoth <= zDay)
  }

  test("zorderPruned query equals the flat-table filter") {
    val got = Events.zorderPruned(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val want = Tables.events(spark, sf)
      .filter($"user_id".between(40, 80) &&
        $"ts".cast("date").between("2024-01-10", "2024-01-15"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(12,2)")).cast("double").as("sv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("3-D interleave: every dimension's slab predicate skips files") {
    import spark.implicits._
    import graft.ops.ZOrder
    val n = 8192
    val dir = java.nio.file.Files.createTempDirectory("graft-z3").toString
    // row-major cube: linear layouts bound one dimension only
    val df = (0 until n).map { i =>
      ((i % 16).toLong, (i / 16 % 16).toLong, (i / 256).toLong)
    }.toDF("a", "b", "c")
    df.withColumn("_z", ZOrder.interleaveN(Seq($"a", $"b", $"c"), bits = 6))
      .repartitionByRange(16, col("_z")).sortWithinPartitions(col("_z"))
      .drop("_z").write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == n)
    def slabHits(c: String): Long = back
      .groupBy(input_file_name()).agg(min(col(c)).as("lo"))
      .filter(col("lo") < 4).count()
    // a quarter-range slab on EACH dimension skips files (a linear
    // sort would leave two of the three dimensions at 16/16); bound
    // is looser for the lowest-significance interleave position
    val hits = Seq("a", "b", "c").map(c => c -> slabHits(c)).toMap
    hits.foreach { case (c, h) =>
      assert(h <= 12, s"slab on $c hit $h of 16 files")
    }
    assert(hits.values.sum <= 24, s"total slab hits ${hits.values.sum}")
  }
}
