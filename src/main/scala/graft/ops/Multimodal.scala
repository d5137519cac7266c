package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2g): opaque binary payloads +
  * typed metadata, with decode/feature-extraction as per-partition
  * batch transforms.
  *
  * The decode step is a clearly-marked deterministic STUB — the
  * image/audio codecs aren't available in this environment — but the
  * Spark-side shape is real: binary columns survive parquet round
  * trips, the transform is a `mapPartitions` over a typed Dataset
  * (per-partition batching, no per-row JNI churn at scale), and the
  * output schema is fixed and columnar.
  */
case class MMRecord(id: Long, modality: String, payload: Array[Byte],
    meta_format: String)

case class MMFeature(id: Long, modality: String, n_bytes: Int,
    checksum: Long, features: Array[Double])

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
