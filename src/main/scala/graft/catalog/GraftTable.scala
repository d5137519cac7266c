package graft.catalog

import graft.etl.DeltaLite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType

import java.util

/** A DeltaLite table as a DSv2 [[Table]] — the unit the analyst-facing
  * catalog surface (`SELECT … FROM graft.db.t`, `INSERT INTO`,
  * `CREATE/DROP/ALTER TABLE`, `VERSION AS OF`) resolves to.
  *
  * Reads: the table CLAIMS `BATCH_READ` but the actual scan is
  * substituted by the injected resolution rule
  * ([[org.apache.spark.sql.graftbridge.GraftCatalogReads]]) with
  * [[DeltaLite.readIndexed]]'s plan — the commit-log FileIndex with
  * stats + partition skipping — exactly the Delta connector's
  * DeltaAnalysis shape (a DSv2 table whose read resolves to a v1
  * HadoopFsRelation so pushdown, pruning and codegen all apply).
  *
  * Writes: `V1_BATCH_WRITE` through [[InsertableRelation]] —
  * `INSERT INTO` appends (schema-enforced by DeltaLite),
  * `INSERT OVERWRITE` truncates-and-replaces as ONE versioned commit.
  *
  * Mirrors the reference's `saveAsTable`/`spark.table` workflow
  * (reference ETL_pipeline_countries.py:129-138) on Graft's own table
  * format.
  */
class GraftTable(tableName: String, val delta: DeltaLite,
    val asOfVersion: Option[Int] = None,
    val asOfTimestampMicros: Option[Long] = None) extends Table
    with SupportsWrite {

  override def name(): String = tableName

  /** Time-travel reads report the schema AS OF that snapshot (a later
    * rename/drop must not misalign the substituted read's columns).
    */
  override def schema(): StructType =
    if (asOfVersion.isEmpty && asOfTimestampMicros.isEmpty)
      delta.schema.getOrElse(new StructType())
    else readDf().schema

  override def partitioning(): Array[Transform] =
    delta.partitionColumns.map(c => Expressions.identity(c)).toArray

  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    m.put("location", delta.root)
    m.put("provider", "graft")
    delta.latestVersion.foreach(v => m.put("version", v.toString))
    m
  }

  override def capabilities(): util.Set[TableCapability] = {
    val s = new util.HashSet[TableCapability]()
    s.add(TableCapability.BATCH_READ)
    s.add(TableCapability.V1_BATCH_WRITE)
    s.add(TableCapability.TRUNCATE)
    s
  }

  /** The DataFrame the read substitution serves: time-travel reads for
    * AS OF tables, the skipping-index scan for current-state reads.
    */
  def readDf(): DataFrame = (asOfVersion, asOfTimestampMicros) match {
    case (Some(v), _) => delta.readAsOf(v)
    case (_, Some(us)) =>
      delta.readAsOfTime(new java.sql.Timestamp(us / 1000L))
    case _ => delta.readIndexed()
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(asOfVersion.isEmpty && asOfTimestampMicros.isEmpty,
      s"cannot write to a time-travel read of $tableName")
    new WriteBuilder with SupportsTruncate {
      private var overwriteAll = false
      override def truncate(): WriteBuilder = { overwriteAll = true; this }
      override def build(): V1Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, ignored: Boolean): Unit =
              if (overwriteAll) delta.overwrite(data)
              else delta.append(data)
          }
      }
    }
  }
}
