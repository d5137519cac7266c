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

  test("frame sampling explodes video payloads only") {
    val frames = Multimodal.frameSample(records, frames = 4).collect()
    val videoIds = records.filter(_.modality == "video").collect().map(_.id).toSet
    assert(frames.map(_.getAs[Long]("id")).toSet == videoIds)
    frames.groupBy(_.getAs[Long]("id")).foreach { case (_, fs) =>
      assert(fs.map(_.getAs[Int]("frame_no")).sorted.toSeq == Seq(0, 1, 2, 3))
      fs.foreach(f => assert(f.getAs[Array[Byte]]("frame_bytes").nonEmpty))
    }
  }
}
