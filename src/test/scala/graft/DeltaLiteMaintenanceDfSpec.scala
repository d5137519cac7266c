package graft

import graft.etl.DeltaLite
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** DF-native maintenance verbs (round-11 item 2): `VACUUM … DRY RUN`
  * and `fsck` compute their retained/probe sets through the
  * entries-DF machinery — a checkpointed or sidecar-backed
  * million-file table answers with ZERO entry loads on the driver.
  * The per-file existence probe / delete stays per-file (that IS the
  * contract); only the set computation moved off the driver. Parity
  * with the driver fold stays executable via the `*Fold` spec twins.
  */
class DeltaLiteMaintenanceDfSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def batch(lo: Long, n: Int): org.apache.spark.sql.DataFrame =
    (lo until lo + n).map(k => (k, s"v$k")).toDF("k", "v")

  test("100k-file table: vacuumCandidates and fsck(dryRun) drive zero entry loads, answers match construction") {
    val root = tmp("graft-maint-big")
    val t = DeltaLite(spark, root, "k")
    t.append(batch(0, 5)) // v0: real files anchor the schema
    val v0Files = t.commitInfo(0)._2
    // v1: a 100k-file snapshot reset — sidecar-backed record
    val many = (0 until 100000).map(i =>
      (s"$root/v=epoch/part-$i.parquet", 1024L))
    assert(t.adoptStreamEpoch(many, overwrite = true, "load", 1L).contains(1))

    // fresh open: DRY RUN must answer from the entries parquet
    val t2 = DeltaLite(spark, root, "k")
    val doomed = t2.vacuumCandidates(1)
    assert(t2.entryLoads.get() == 0,
      s"vacuumCandidates drove ${t2.entryLoads.get()} entry loads on a " +
        "sidecar-backed table")
    // doomed = exactly v0's files, in their add order
    assert(doomed == v0Files, s"doomed diverged: $doomed vs $v0Files")

    // fsck DRY RUN: the 100k adopted paths never existed — all missing,
    // in live (idx) order, still zero entry loads AND zero serial
    // driver FS probes (100k paths >> threshold → the probes ran as a
    // bounded-parallelism executor job)
    val missing = t2.fsck(dryRun = true)
    assert(t2.entryLoads.get() == 0,
      s"fsck drove ${t2.entryLoads.get()} entry loads")
    assert(t2.serialFsOps.get() == 0,
      s"fsck made ${t2.serialFsOps.get()} serial driver FS probes at " +
        "100k files — the probe loop did not distribute")
    // adoptStreamEpoch publishes its files lexically sorted — live
    // (idx) order is the sorted order
    assert(missing == many.map(_._1).sorted, "fsck probe set diverged " +
      "from the adopted epoch's live order")
  }

  test("distributed probe/delete parity: forced distribution answers byte-identically to the driver loop and leaves zero serial FS ops") {
    val root = tmp("graft-maint-dist")
    def handle(threshold: Int) = new DeltaLite(spark, root, Some("k")) {
      override protected def maintenanceDistributeThreshold: Int = threshold
    }
    val t = handle(Int.MaxValue)
    t.append(batch(0, 10))     // v0
    t.overwrite(batch(50, 10)) // v1: v0's files doomed at retain=1
    t.append(batch(70, 5))     // v2
    // out-of-band deletion for the fsck half
    val victim = t.commitInfo(2)._2.head
    val victimRows = spark.read.parquet(victim).count()
    assert(new java.io.File(
      new org.apache.hadoop.fs.Path(victim).toUri.getPath).delete())
    // fsck: driver loop (high threshold) vs distributed (threshold 1)
    val serial = handle(Int.MaxValue)
    val missSerial = serial.fsck(dryRun = true)
    assert(serial.serialFsOps.get() > 0,
      "reference run did not exercise the driver loop — parity vacuous")
    val dist = handle(1)
    val missDist = dist.fsck(dryRun = true)
    assert(dist.serialFsOps.get() == 0,
      s"forced-distributed fsck still made ${dist.serialFsOps.get()} " +
        "serial driver probes")
    assert(missDist == missSerial && missDist == Seq(victim),
      s"distributed fsck diverged: $missDist vs $missSerial")
    // repair (drops the dangling reference) so the post-vacuum read
    // has a consistent live set to verify against
    assert(handle(Int.MaxValue).fsck() == Seq(victim))
    // vacuum: same doomed set through the distributed delete, files
    // actually reclaimed, zero serial driver deletes
    val expected = handle(Int.MaxValue).vacuumCandidates(1)
    assert(expected.nonEmpty)
    val vd = handle(1)
    val deleted = vd.vacuum(1)
    assert(vd.serialFsOps.get() == 0,
      s"forced-distributed vacuum made ${vd.serialFsOps.get()} serial deletes")
    assert(deleted == expected)
    expected.foreach(p => assert(!new java.io.File(
      new org.apache.hadoop.fs.Path(p).toUri.getPath).exists(),
      s"$p survived the distributed vacuum"))
    assert(handle(Int.MaxValue).read().count() == 15 - victimRows)
  }

  test("mixed history (checkpoint, DVs, restats, overwrite): DF path is byte-identical to the driver fold at several retentions") {
    val root = tmp("graft-maint-mixed")
    val t = new DeltaLite(spark, root, Some("k"), checkpointInterval = 4) {
      override protected def commitSidecarThreshold: Int = 1
    }
    (0 until 3).foreach(i => t.append(batch(i * 10L, 10)))     // v0..v2
    assert(t.deleteWhere(col("k") === 5L).contains(3))          // v3: DVs
    t.append(batch(100, 10))                                    // v4 (cp)
    assert(t.restats(Seq("k", "v")).contains(5))                // v5
    t.overwrite(batch(500, 20))                                 // v6: reset
    t.append(batch(600, 10))                                    // v7
    assert(t.deleteWhere(col("k") === 603L).isDefined)          // v8: DVs

    (1 to 4).foreach { retain =>
      val viaDf = DeltaLite(spark, root, "k")
      val gotDf = viaDf.vacuumCandidates(retain)
      assert(viaDf.entryLoads.get() == 0,
        s"retain=$retain: DF path loaded entries")
      val viaFold = DeltaLite(spark, root, "k")
      val gotFold = viaFold.vacuumCandidatesFold(retain)
      assert(viaFold.entryLoads.get() > 0,
        "fold twin did not exercise the driver path — parity compare " +
          "would be vacuous")
      assert(gotDf == gotFold,
        s"retain=$retain: DF ${gotDf.size} paths vs fold ${gotFold.size}: " +
          s"${gotDf.diff(gotFold)} / ${gotFold.diff(gotDf)}")
    }

    // fsck parity after an out-of-band deletion, repair still works
    val live = DeltaLite(spark, root, "k")
    val somePath = live.commitInfo(7)._2.head
    assert(new java.io.File(
      new org.apache.hadoop.fs.Path(somePath).toUri.getPath).delete(),
      s"fixture: could not remove $somePath")
    val viaDf = DeltaLite(spark, root, "k")
    val missDf = viaDf.fsck(dryRun = true)
    assert(viaDf.entryLoads.get() == 0, "fsck DF path loaded entries")
    val viaFold = DeltaLite(spark, root, "k")
    val missFold = viaFold.fsckFold(dryRun = true)
    assert(missDf == missFold && missDf == Seq(somePath))
    // repair publishes the removal; reads work again
    assert(viaDf.fsck() == Seq(somePath))
    val after = DeltaLite(spark, root, "k").read()
    assert(after.filter(col("k") === 603L).count() == 0, "DV lost by repair")
    assert(after.count() > 0)
  }

  test("totalLiveBytes answers from the entries DF with zero entry loads, equal to the fold") {
    val root = tmp("graft-maint-bytes")
    val t = new DeltaLite(spark, root, Some("k")) {
      override protected def commitSidecarThreshold: Int = 1
    }
    (0 until 3).foreach(i => t.append(batch(i * 10L, 10)))
    assert(t.deleteWhere(col("k") === 5L).isDefined)
    assert(t.checkpointNow().isDefined) // DF-expressible live set
    val expected = t.liveFileSizes().flatMap(_._2).sum
    val t2 = DeltaLite(spark, root, "k")
    assert(t2.totalLiveBytes() == expected)
    assert(t2.entryLoads.get() == 0,
      "totalLiveBytes materialized the live entry set")
  }

  test("vacuum (real delete) through the DF path reclaims exactly the fold's doomed set and keeps retained versions readable") {
    val root = tmp("graft-maint-vac")
    val t = new DeltaLite(spark, root, Some("k")) {
      override protected def commitSidecarThreshold: Int = 1
    }
    t.append(batch(0, 10))   // v0
    t.overwrite(batch(50, 10)) // v1: v0's files doomed at retain=1
    t.append(batch(70, 5))   // v2
    val expected = DeltaLite(spark, root, "k").vacuumCandidatesFold(1)
    assert(expected.nonEmpty)
    val t2 = DeltaLite(spark, root, "k")
    val deleted = t2.vacuum(1)
    assert(deleted == expected)
    expected.foreach(p => assert(!new java.io.File(
      new org.apache.hadoop.fs.Path(p).toUri.getPath).exists(),
      s"$p survived vacuum"))
    assert(DeltaLite(spark, root, "k").read().count() == 15)
  }
}
