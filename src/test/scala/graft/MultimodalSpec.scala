package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val records = Multimodal.fromDocuments(Tables.documents(spark, sf))

  test("binary payload round trip: schema and byte fidelity") {
    assert(records.schema("payload").dataType.typeName == "binary")
    val r = records.filter(col("id") === 7L).collect().head
    val original = Tables.documents(spark, sf).filter(col("doc_id") === 7L)
      .select("text").collect().head.getString(0)
    assert(new String(r.payload, "UTF-8") == original)
    assert(Multimodal.Modalities.contains(r.modality))
  }

  test("stub decode: deterministic features, fixed dim, distributed shape") {
    val f1 = Multimodal.decodeFeatures(records, dim = 8).collect()
      .map(f => f.id -> (f.checksum, f.features.toSeq)).toMap
    val f2 = Multimodal.decodeFeatures(records, dim = 8).collect()
      .map(f => f.id -> (f.checksum, f.features.toSeq)).toMap
    assert(f1 == f2) // deterministic across runs
    assert(f1.values.forall(_._2.length == 8))
    assert(f1.values.forall(_._2.forall(v => v >= 0.0 && v <= 1.0)))
    // n_bytes carried through matches payload length
    val feats = Multimodal.decodeFeatures(records, dim = 4)
    assert(feats.filter(f => f.n_bytes <= 0).isEmpty)
  }

  test("real PNG decode: dimensions, channel means, thumbnail vs ground truth") {
    import spark.implicits._
    val imgs = Multimodal.syntheticImages(spark, n = 12, w = 16, h = 12)
    val feats = Multimodal.decodeImages(imgs, thumbW = 4, thumbH = 4)
      .collect().map(f => f.id -> f).toMap
    assert(feats.size == 12)
    // ground truth recomputed from the generator formula, driver-side
    for (id <- 0L until 12L) {
      val f = feats(id)
      assert(f.width == 16 && f.height == 12 && f.n_pixels == 192)
      val pix = for (y <- 0 until 12; x <- 0 until 16) yield (
        ((id * 37 + x * 16) % 256).toInt,
        ((id * 11 + y * 21) % 256).toInt,
        ((id * 53 + x + y) % 256).toInt)
      assert(math.abs(f.mean_r - pix.map(_._1).sum / 192.0) < 1e-9)
      assert(math.abs(f.mean_g - pix.map(_._2).sum / 192.0) < 1e-9)
      assert(math.abs(f.mean_b - pix.map(_._3).sum / 192.0) < 1e-9)
      assert(f.thumb.length == 16 && f.thumb.forall(v => v >= 0.0 && v <= 1.0))
    }
  }

  test("real PNG payloads survive a parquet round trip and still decode") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-png").toString
    Multimodal.syntheticImages(spark, n = 5).toDF()
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).as[graft.ops.MMRecord]
    val decoded = Multimodal.decodeImages(back).collect()
    assert(decoded.length == 5)
    assert(decoded.forall(f => f.width == 16 && f.height == 12))
  }

  test("real WAV decode: format, amplitude stats vs ground truth; parquet round trip") {
    import spark.implicits._
    val n = 6
    val feats = Multimodal.decodeAudio(Multimodal.syntheticAudio(spark, n))
      .collect().map(f => f.id -> f).toMap
    assert(feats.size == n)
    for (id <- 0L until n.toLong) {
      val f = feats(id)
      assert(f.sample_rate == 8000 && f.n_samples == 1600)
      val v = (0 until 1600).map(i => ((id * 31 + i * 7) % 2001 - 1000).toInt)
      assert(f.mean_amp == v.sum.toDouble / 1600)
      assert(f.peak == v.map(math.abs).max)
      assert(f.rms == math.sqrt(v.map(x => x.toLong * x).sum.toDouble / 1600))
    }
    // payloads survive parquet and still decode through the codec
    val dir = java.nio.file.Files.createTempDirectory("graft-wav").toString
    Multimodal.syntheticAudio(spark, 4).toDF().write.mode("overwrite").parquet(dir)
    val back = Multimodal.decodeAudio(
      spark.read.parquet(dir).as[graft.ops.MMRecord]).collect()
    assert(back.length == 4 && back.forall(_.n_samples == 1600))
  }

  test("real GIF video decode: frame sampling + per-frame stats vs ground truth") {
    import spark.implicits._
    val vids = Multimodal.syntheticVideo(spark, n = 4, frames = 8)
    val frames = Multimodal.decodeVideo(vids, sampleEvery = 2).collect()
    assert(frames.length == 4 * 4) // frames 0,2,4,6 per video
    for (f <- frames) {
      assert(f.n_frames == 8 && f.width == 16 && f.height == 12)
      val expect = (for (y <- 0 until 12; x <- 0 until 16)
        yield (f.id * 13 + f.frame * 29 + x * 3 + y * 5) % 256).sum.toDouble / 192
      assert(f.mean_gray == expect, s"id=${f.id} frame=${f.frame}")
    }
    // container bytes survive parquet and still decode
    val dir = java.nio.file.Files.createTempDirectory("graft-gif").toString
    vids.toDF().write.mode("overwrite").parquet(dir)
    val back = Multimodal.decodeVideo(
      spark.read.parquet(dir).as[graft.ops.MMRecord], sampleEvery = 4)
    assert(back.count() == 4 * 2) // frames 0,4
  }

  test("frame sampling explodes video payloads only") {
    val frames = Multimodal.frameSample(records, frames = 4).collect()
    val videoIds = records.filter(_.modality == "video").collect().map(_.id).toSet
    assert(frames.map(_.getAs[Long]("id")).toSet == videoIds)
    frames.groupBy(_.getAs[Long]("id")).foreach { case (_, fs) =>
      assert(fs.map(_.getAs[Int]("frame_no")).sorted.toSeq == Seq(0, 1, 2, 3))
      fs.foreach(f => assert(f.getAs[Array[Byte]]("frame_bytes").nonEmpty))
    }
  }

  /** Ground-truth aHash straight from the generator formula — no codec. */
  private def phashOf(f: Long, w: Int = 16, h: Int = 12, grid: Int = 4): Long = {
    val sums = Array.ofDim[Long](grid * grid)
    val cnts = Array.ofDim[Long](grid * grid)
    for (y <- 0 until h; x <- 0 until w) {
      val lum = (f * 37 + x * 16) % 256 + (f * 11 + y * 21) % 256 +
        (f * 53 + x + y) % 256
      val c = (y * grid / h) * grid + (x * grid / w)
      sums(c) += lum; cnts(c) += 1
    }
    val n = w.toLong * h
    val total = sums.sum
    (0 until grid * grid).foldLeft(0L) { (acc, c) =>
      if (sums(c) * n > total * cnts(c)) acc | (1L << c) else acc
    }
  }

  test("imagePhash: decoded hash equals formula ground truth; copies collide") {
    import spark.implicits._
    val base = Multimodal.syntheticImages(spark, n = 24)
    val copies = base.filter(_.id % 6 == 0).map(r => r.copy(id = r.id + 100))
    val got = Multimodal.imagePhash(base.union(copies)).collect()
      .map(p => p.id -> p.phash).toMap
    assert(got.size == 28)
    (0L until 24L).foreach(id => assert(got(id) == phashOf(id)))
    // planted byte-identical copies hash with their originals
    Seq(0L, 6L, 12L, 18L).foreach(k => assert(got(k + 100) == got(k)))
    // the hash separates MOST distinct gradient images (aHash is a
    // bucketing fingerprint, not a cryptographic one)
    val distinctHashes = (0L until 24L).map(got).distinct.size
    assert(distinctHashes >= 12, s"only $distinctHashes distinct hashes")
  }

  test("videoFramePhash: copies share every sampled frame hash; sampling honored") {
    import spark.implicits._
    val base = Multimodal.syntheticVideo(spark, n = 12)
    val copies = base.filter(_.id % 4 == 0).map(r => r.copy(id = r.id + 100))
    val fp = Multimodal.videoFramePhash(base.union(copies), sampleEvery = 2)
      .collect()
    val byVideo = fp.groupBy(_.id)
    assert(byVideo.size == 15)
    // 8 frames sampled every 2nd -> frames 0,2,4,6
    byVideo.values.foreach { frames =>
      assert(frames.map(_.frame).sorted.toSeq == Seq(0, 2, 4, 6))
    }
    def hashes(id: Long) = byVideo(id).sortBy(_.frame).map(_.phash).toSeq
    Seq(0L, 4L, 8L).foreach { k =>
      assert(hashes(k + 100) == hashes(k),
        s"byte-identical copy $k+100 must share every frame hash")
    }
  }
}
