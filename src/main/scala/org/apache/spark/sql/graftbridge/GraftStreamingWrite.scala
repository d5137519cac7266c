package org.apache.spark.sql.graftbridge

import graft.etl.DeltaLite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** DSv2 streaming write for `df.writeStream.toTable("graft.db.t")` —
  * the write-side twin of `readStream.table`: per-task writers land
  * parquet files under nonce-unique `v=s<epoch>-…` dirs (crash
  * orphans are invisible to readers and swept by vacuumOrphans, the
  * batch-commit discipline), and the DRIVER publishes the epoch as
  * ONE txn-stamped commit ([[DeltaLite]] adoptStreamEpoch) — a
  * replayed epoch is skipped by the per-query high-water mark and its
  * duplicate files deleted, so the sink is exactly-once across
  * restarts like [[graft.streaming.DeltaSink]]'s foreachBatch path.
  * Complete output mode publishes `overwrite` commits instead of
  * appends. Rows stream straight into parquet writers
  * ([[ParquetWriteSupport]], the same InternalRow write support the
  * batch writer uses) — no buffering, no driver round-trip of data.
  */
class GraftStreamingWrite(delta: DeltaLite, physSchema: StructType,
    root: String, queryId: String, overwriteAll: Boolean,
    conf: SerializableConfiguration) extends StreamingWrite {

  private def appId = s"graft-stream-$queryId"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftStreamingWriterFactory(physSchema.json, root, conf)

  private def deleteFiles(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(root).getFileSystem(conf.value)
    messages.foreach {
      case GraftFileMessage(p, _) =>
        // each writer owns its nonce dir — remove the whole dir
        fs.delete(new Path(p).getParent, true)
      case _ => ()
    }
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect { case GraftFileMessage(p, b) => (p, b) }.toSeq
    delta.adoptStreamEpoch(files, overwriteAll, appId, epochId) match {
      case None =>
        // replayed epoch (already published before a crash/restart):
        // this attempt's files are duplicates — drop them
        deleteFiles(messages)
      case Some(_) => ()
    }
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = deleteFiles(messages)
}

case class GraftFileMessage(path: String, bytes: Long)
  extends WriterCommitMessage

class GraftStreamingWriterFactory(schemaJson: String, root: String,
    conf: SerializableConfiguration) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftStreamDataWriter(
      org.apache.spark.sql.types.DataType.fromJson(schemaJson)
        .asInstanceOf[StructType],
      root, conf, partitionId, epochId)
}

class GraftStreamDataWriter(schema: StructType, root: String,
    conf: SerializableConfiguration, partitionId: Int, epochId: Long)
    extends DataWriter[InternalRow] {

  private val dir = new Path(root,
    s"v=s$epochId-${java.util.UUID.randomUUID().toString.take(8)}")
  private val file = new Path(dir, f"part-$partitionId%05d.parquet")
  private val hconf = new org.apache.hadoop.conf.Configuration(conf.value)
  ParquetWriteSupport.setSchema(schema, hconf)
  // the keys ParquetUtils.prepareWrite plants and ParquetWriteSupport
  // asserts on — absent from a bare session hadoopConf
  private def default(k: String, v: String): Unit =
    if (hconf.get(k) == null) hconf.set(k, v)
  default("spark.sql.parquet.writeLegacyFormat", "false")
  default("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
  default("spark.sql.parquet.fieldId.write.enabled", "true")
  default("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
  default("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
  default("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
  default("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
  private val writer =
    new org.apache.parquet.hadoop.ParquetWriter[InternalRow](
      file, hconf, new ParquetWriteSupport)
  private var wrote = false

  override def write(record: InternalRow): Unit = {
    wrote = true
    writer.write(record)
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    val fs = file.getFileSystem(hconf)
    if (!wrote) { // empty partition: nothing to publish
      fs.delete(dir, true)
      new WriterCommitMessage {}
    } else GraftFileMessage(file.toString, fs.getFileStatus(file).getLen)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Throwable => () }
    file.getFileSystem(hconf).delete(dir, true)
  }

  override def close(): Unit = ()
}
