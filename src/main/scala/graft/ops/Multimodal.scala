package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2g): opaque binary payloads +
  * typed metadata, with decode/feature-extraction as per-partition
  * batch transforms.
  *
  * All three modalities decode REAL bytes with in-JDK codecs:
  *  - images via `javax.imageio` ([[Multimodal.decodeImages]] —
  *    PNG/BMP/JPEG, pixel stats out);
  *  - audio via `javax.sound.sampled` ([[Multimodal.decodeAudio]] —
  *    WAV/PCM container + frames, amplitude stats);
  *  - video via the ImageIO multi-frame GIF sequence reader
  *    ([[Multimodal.decodeVideo]] — container parse, frame sampling,
  *    per-frame luminance).
  * The generic [[Multimodal.decodeFeatures]] keeps a deterministic
  * fallback codec for arbitrary payloads. The Spark-side shape is the
  * point: binary columns survive parquet round trips, transforms are
  * `mapPartitions` over typed Datasets (per-partition batching — codec
  * setup amortizes across the batch, no per-row JNI churn at scale),
  * and output schemas are fixed and columnar.
  */
case class MMRecord(id: Long, modality: String, payload: Array[Byte],
    meta_format: String)

case class MMFeature(id: Long, modality: String, n_bytes: Int,
    checksum: Long, features: Array[Double])

case class ImageFeature(id: Long, width: Int, height: Int, n_pixels: Long,
    mean_r: Double, mean_g: Double, mean_b: Double, thumb: Array[Double])

case class AudioFeature(id: Long, sample_rate: Int, n_samples: Long,
    mean_amp: Double, peak: Int, rms: Double)

case class VideoFrame(id: Long, frame: Int, n_frames: Int, width: Int,
    height: Int, mean_gray: Double)

case class ImagePHash(id: Long, phash: Long, n_bits: Int)

case class FramePHash(id: Long, frame: Int, phash: Long)

object Multimodal {

  val Modalities = Seq("image", "audio", "video")

  /** Synthesize a multimodal table from documents: payloads are the
    * UTF-8 bytes (opaque to everything downstream — exactly how real
    * image bytes would flow), modality assigned deterministically.
    */
  def fromDocuments(docs: DataFrame): Dataset[MMRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("id"),
      element_at(typedlit(Modalities), (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
        .as("modality"),
      col("text").cast("binary").as("payload"),
      concat(lit("fake/"), col("source")).as("meta_format"))
      .as[MMRecord]
  }

  /** STUB decode: a real implementation would call the codec here
    * (per-partition, reusing a decoder instance across the batch). The
    * stand-in derives a deterministic feature vector from the payload
    * bytes so tests can assert end-to-end plumbing.
    */
  def decodeFeatures(records: Dataset[MMRecord], dim: Int = 8): Dataset[MMFeature] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      // per-partition setup would init the codec once, here
      it.map { r =>
        val crc = new java.util.zip.CRC32
        crc.update(r.payload)
        val feats = Array.tabulate(dim) { i =>
          if (r.payload.isEmpty) 0.0
          else (r.payload(i % r.payload.length) & 0xFF) / 255.0
        }
        MMFeature(r.id, r.modality, r.payload.length, crc.getValue, feats)
      }
    }
  }

  /** Synthesize REAL PNG payloads on the executors: a deterministic
    * per-id color gradient rendered into a BufferedImage and encoded
    * with `javax.imageio` (in-JDK codec — no external deps). These are
    * genuine image bytes: any PNG decoder reads them back.
    */
  def syntheticImages(spark: SparkSession, n: Int, w: Int = 16,
      h: Int = 12): Dataset[MMRecord] = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val r = ((id * 37 + x * 16) % 256).toInt
            val g = ((id * 11 + y * 21) % 256).toInt
            val b = ((id * 53 + x + y) % 256).toInt
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MMRecord(id, "image", bos.toByteArray, "image/png")
      }
    }
  }

  /** REAL image decode: `javax.imageio.ImageIO.read` per payload inside
    * a `mapPartitions` batch (decoder dispatch tables warm once per
    * partition, not per row). Emits the typed metadata a training
    * pipeline filters on (dimensions, channel means) plus a
    * `thumbW`×`thumbH` average-pooled grayscale thumbnail — the
    * resize/feature-extract step, done with exact integer pooling so
    * results are bit-deterministic across JVMs.
    */
  def decodeImages(records: Dataset[MMRecord], thumbW: Int = 4,
      thumbH: Int = 4): Dataset[ImageFeature] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.filter(_.modality == "image").mapPartitions { it =>
      it.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable image payload for id=${r.id}")
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        val pool = Array.ofDim[Long](thumbH, thumbW)
        val cnt = Array.ofDim[Long](thumbH, thumbW)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val cr = (rgb >> 16) & 0xFF
            val cg = (rgb >> 8) & 0xFF
            val cb = rgb & 0xFF
            sr += cr; sg += cg; sb += cb
            val py = y * thumbH / h
            val px = x * thumbW / w
            pool(py)(px) += (cr + cg + cb) / 3
            cnt(py)(px) += 1
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val thumb = Array.tabulate(thumbH * thumbW) { i =>
          val (py, px) = (i / thumbW, i % thumbW)
          if (cnt(py)(px) == 0) 0.0
          else pool(py)(px).toDouble / cnt(py)(px) / 255.0
        }
        ImageFeature(r.id, w, h, n, sr.toDouble / n, sg.toDouble / n,
          sb.toDouble / n, thumb)
      }
    }
  }

  /** Synthesize REAL WAV payloads on the executors: a deterministic
    * integer pseudo-noise waveform (PCM16 mono) wrapped in a standard
    * 44-byte RIFF/WAVE header. Integer samples make every downstream
    * stat exactly recomputable without the codec — which is what the
    * `mm_audio_decode` oracle does.
    */
  /** Perceptual average-hash (aHash) over REAL decoded pixels: the
    * image is pooled onto a `grid`×`grid` luminance map and each cell
    * contributes a 1-bit "brighter than the image mean" — the standard
    * near-duplicate-image fingerprint (identical/re-encoded images
    * collide; unrelated images don't). All-integer comparison
    * (cellSum·nPixels > total·cellCount avoids any division), so the
    * hash is exact and engine-independent — the multimodal counterpart
    * of the text SimHash dedup pass.
    */
  def imagePhash(records: Dataset[MMRecord], grid: Int = 4)
      : Dataset[ImagePHash] = {
    val spark = records.sparkSession
    import spark.implicits._
    require(grid * grid <= 63, "phash must fit one long")
    records.filter(_.modality == "image").mapPartitions { it =>
      it.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable image payload for id=${r.id}")
        val (w, h) = (img.getWidth, img.getHeight)
        val sums = Array.ofDim[Long](grid * grid)
        val cnts = Array.ofDim[Long](grid * grid)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
            val c = (y * grid / h) * grid + (x * grid / w)
            sums(c) += lum
            cnts(c) += 1
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val total = sums.sum
        var hash = 0L
        var bits = 0
        var c = 0
        while (c < grid * grid) {
          // cell mean > image mean, cross-multiplied to stay integer
          if (sums(c) * n > total * cnts(c)) {
            hash |= 1L << c
            bits += 1
          }
          c += 1
        }
        ImagePHash(r.id, hash, bits)
      }
    }
  }

  def syntheticAudio(spark: SparkSession, n: Int, sampleRate: Int = 8000,
      numSamples: Int = 1600): Dataset[MMRecord] = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val bb = java.nio.ByteBuffer.allocate(44 + numSamples * 2)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val dataLen = numSamples * 2
        bb.put("RIFF".getBytes); bb.putInt(36 + dataLen)
        bb.put("WAVE".getBytes)
        bb.put("fmt ".getBytes); bb.putInt(16)
        bb.putShort(1)                       // PCM
        bb.putShort(1)                       // mono
        bb.putInt(sampleRate)
        bb.putInt(sampleRate * 2)            // byte rate
        bb.putShort(2)                       // block align
        bb.putShort(16)                      // bits per sample
        bb.put("data".getBytes); bb.putInt(dataLen)
        var i = 0
        while (i < numSamples) {
          bb.putShort((((id * 31 + i * 7) % 2001) - 1000).toShort)
          i += 1
        }
        MMRecord(id, "audio", bb.array(), "audio/wav")
      }
    }
  }

  /** REAL audio decode: `javax.sound.sampled.AudioSystem` parses the
    * container and format per payload inside a `mapPartitions` batch;
    * PCM16 frames become amplitude stats (mean/peak/RMS) — the
    * loudness/clipping features an audio-corpus filter runs on.
    */
  def decodeAudio(records: Dataset[MMRecord]): Dataset[AudioFeature] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.filter(_.modality == "audio").mapPartitions { it =>
      it.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"expected PCM16 mono for id=${r.id}, got $fmt")
        val bytes = ais.readAllBytes()
        ais.close()
        val n = bytes.length / 2
        val bb = java.nio.ByteBuffer.wrap(bytes).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        var sum = 0L; var sumSq = 0L; var peak = 0
        var i = 0
        while (i < n) {
          val s = bb.getShort(i * 2).toInt
          sum += s; sumSq += s.toLong * s
          if (math.abs(s) > peak) peak = math.abs(s)
          i += 1
        }
        AudioFeature(r.id, fmt.getSampleRate.toInt, n,
          sum.toDouble / n, peak, math.sqrt(sumSq.toDouble / n))
      }
    }
  }

  /** Synthesize REAL video payloads: multi-frame animated GIFs (the one
    * multi-frame container the JDK can both write and read) with an
    * explicit 256-gray palette, which round-trips pixel values
    * losslessly. Frame pixels follow a per-(id, frame) gradient formula
    * so decoded stats are exactly recomputable without the codec.
    */
  def syntheticVideo(spark: SparkSession, n: Int, w: Int = 16, h: Int = 12,
      frames: Int = 8): Dataset[MMRecord] = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { ids =>
      // palette + writer warm once per partition (the batch-amortized
      // codec-setup shape a real encoder farm needs); only the output
      // stream is per-record
      val grays = Array.tabulate(256)(_.toByte)
      val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      ids.map { id =>
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < frames) {
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0,
                ((id * 13 + f * 29 + x * 3 + y * 5) % 256).toInt)
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence(); ios.close()
        MMRecord(id, "video", bos.toByteArray, "image/gif")
      }
    }
  }

  /** REAL video frame sampling + decode: the GIF container is parsed
    * per payload (`ImageIO` multi-frame reader), every `sampleEvery`-th
    * frame is decoded, and per-frame luminance stats come out — the
    * decode/frame-sample/feature-extract step of a video corpus
    * pipeline, one output row per sampled frame.
    */
  def decodeVideo(records: Dataset[MMRecord],
      sampleEvery: Int = 2): Dataset[VideoFrame] = {
    require(sampleEvery >= 1)
    val spark = records.sparkSession
    import spark.implicits._
    records.filter(_.modality == "video").mapPartitions { it =>
      // reader registry lookup once per partition, not per record
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      it.flatMap { r =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        val out = (0 until n by sampleEvery).map { f =>
          val img = reader.read(f)
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += (img.getRGB(x, y) & 0xFF); x += 1 }
            y += 1
          }
          VideoFrame(r.id, f, n, w, h, sum.toDouble / (w.toLong * h))
        }
        iis.close()
        out
      }
    }
  }

  /** Per-frame perceptual hash over REAL decoded video frames: every
    * `sampleEvery`-th frame of the GIF container gets the same
    * all-integer average-hash as [[imagePhash]] — the frame-level
    * near-dup signature that video dedup joins on (two videos sharing
    * most sampled-frame hashes are duplicates/re-encodes). One decode
    * pass per payload inside `mapPartitions`, reader warmed per
    * partition, one output row per sampled frame.
    */
  def videoFramePhash(records: Dataset[MMRecord], sampleEvery: Int = 2,
      grid: Int = 4): Dataset[FramePHash] = {
    require(sampleEvery >= 1)
    require(grid * grid <= 63, "phash must fit one long")
    val spark = records.sparkSession
    import spark.implicits._
    records.filter(_.modality == "video").mapPartitions { it =>
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      it.flatMap { r =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        val out = (0 until n by sampleEvery).map { f =>
          val img = reader.read(f)
          val (w, h) = (img.getWidth, img.getHeight)
          val sums = Array.ofDim[Long](grid * grid)
          val cnts = Array.ofDim[Long](grid * grid)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
              val c = (y * grid / h) * grid + (x * grid / w)
              sums(c) += lum
              cnts(c) += 1
              x += 1
            }
            y += 1
          }
          val np = w.toLong * h
          val total = sums.sum
          var hash = 0L
          var c = 0
          while (c < grid * grid) {
            if (sums(c) * np > total * cnts(c)) hash |= 1L << c
            c += 1
          }
          FramePHash(r.id, f, hash)
        }
        iis.close()
        out
      }
    }
  }

  /** Frame sampling for video payloads: one row per pseudo-frame
    * (payload sliced into `frames` chunks) — the explode shape a real
    * frame sampler produces.
    */
  def frameSample(records: Dataset[MMRecord], frames: Int): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    records.filter(_.modality == "video").toDF()
      .withColumn("frame_no", explode(sequence(lit(0), lit(frames - 1))))
      .withColumn("frame_bytes",
        col("payload").substr(
          col("frame_no") * (length(col("payload")) / frames).cast("int") + 1,
          greatest((length(col("payload")) / frames).cast("int"), lit(1))))
      .select("id", "frame_no", "frame_bytes")
  }
}
