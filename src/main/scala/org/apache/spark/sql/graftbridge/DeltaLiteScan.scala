package org.apache.spark.sql.graftbridge

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._

/** Scan-integrated file skipping for DeltaLite tables — the same
  * integration shape the Delta connector uses (a custom [[FileIndex]]
  * served into a HadoopFsRelation): the commit log's per-file
  * [min, max] stats on the table's stats key prune files DURING scan
  * planning, driven by the query's own pushed-down data filters. No
  * manual pre-filtering: `WHERE key = x` on the DataFrame is enough,
  * and the FileSourceScan's numFiles metric reflects the skip.
  *
  * Lives under the spark.sql namespace because the datasource
  * internals (LogicalRelation, HadoopFsRelation) are private[sql] —
  * the standard extension-library placement (see [[Bridge]]).
  */
class DeltaLiteFileIndex(
    spark: SparkSession,
    root: Path,
    entries: Seq[(String, Option[String], Option[String])],
    statsCol: Option[String],
    dataSchema: StructType) extends FileIndex {

  private val fs = root.getFileSystem(
    spark.sessionState.newHadoopConf())

  private lazy val statuses: Seq[(FileStatus, Option[String], Option[String])] =
    entries.map { case (p, mn, mx) =>
      (fs.getFileStatus(new Path(p)), mn, mx)
    }

  override def rootPaths: Seq[Path] = Seq(root)
  override def partitionSchema: StructType = StructType(Nil)
  override def inputFiles: Array[String] = entries.map(_._1).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = statuses.map(_._1.getLen).sum

  private def keyType: Option[DataType] =
    statsCol.flatMap(c => dataSchema.fields.find(_.name == c).map(_.dataType))

  /** Typed compare of the stringified stats (same encoding the commit
    * log records — see DeltaLite.commit's stringify note).
    */
  private def cmp(dt: DataType, a: String, b: String): Int = dt match {
    case LongType | IntegerType | ShortType | ByteType =>
      java.lang.Long.compare(a.toLong, b.toLong)
    case DoubleType | FloatType => java.lang.Double.compare(a.toDouble, b.toDouble)
    case _: DecimalType => new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
    case _ => a.compareTo(b) // string/date/timestamp stringify in order
  }

  /** Conservative per-file survival under one pushed filter: only
    * simple (key ⊙ literal) shapes prune; anything else keeps the
    * file. Null stats keep the file (correctness over skipping).
    */
  private def survives(mn: Option[String], mx: Option[String],
      filter: Expression, key: String, dt: DataType): Boolean = {
    // The literal must reach the SAME string form the stats were
    // recorded in (a Spark string cast at commit time): a raw
    // Literal.value.toString would render dates/timestamps in Catalyst
    // internal form (days-int / micros-long) and the lexical fallback
    // would silently prune files that contain matching rows. A null
    // literal is conservative-kept (forall over None is true).
    def litv(l: Literal): Option[String] =
      Option(Cast(l, org.apache.spark.sql.types.StringType,
        Some(spark.sessionState.conf.sessionLocalTimeZone)).eval(null))
        .map(_.toString)
    (mn, mx) match {
      case (Some(lo), Some(hi)) => filter match {
        case And(l, r) =>
          survives(mn, mx, l, key, dt) && survives(mn, mx, r, key, dt)
        case EqualTo(a: Attribute, l: Literal) if a.name == key =>
          litv(l).forall(v => cmp(dt, v, lo) >= 0 && cmp(dt, v, hi) <= 0)
        case EqualTo(l: Literal, a: Attribute) if a.name == key =>
          litv(l).forall(v => cmp(dt, v, lo) >= 0 && cmp(dt, v, hi) <= 0)
        case GreaterThan(a: Attribute, l: Literal) if a.name == key =>
          litv(l).forall(v => cmp(dt, hi, v) > 0)
        case GreaterThanOrEqual(a: Attribute, l: Literal) if a.name == key =>
          litv(l).forall(v => cmp(dt, hi, v) >= 0)
        case LessThan(a: Attribute, l: Literal) if a.name == key =>
          litv(l).forall(v => cmp(dt, lo, v) < 0)
        case LessThanOrEqual(a: Attribute, l: Literal) if a.name == key =>
          litv(l).forall(v => cmp(dt, lo, v) <= 0)
        case _ => true
      }
      case _ => true
    }
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = (statsCol, keyType) match {
      case (Some(key), Some(dt)) if dataFilters.nonEmpty =>
        statuses.filter { case (_, mn, mx) =>
          dataFilters.forall(f => survives(mn, mx, f, key, dt))
        }
      case _ => statuses
    }
    Seq(PartitionDirectory(InternalRow.empty, kept.map(_._1).toArray))
  }
}

object DeltaLiteScan {

  /** DataFrame over the live files through the skipping index. */
  def relation(spark: SparkSession, root: Path,
      entries: Seq[(String, Option[String], Option[String])],
      statsCol: Option[String], schema: StructType): DataFrame = {
    val index = new DeltaLiteFileIndex(spark, root, entries, statsCol, schema)
    val rel = HadoopFsRelation(index, partitionSchema = StructType(Nil),
      dataSchema = schema, bucketSpec = None,
      fileFormat = new ParquetFileFormat, options = Map.empty)(spark)
    Bridge.ofRows(spark, LogicalRelation(rel, isStreaming = false))
  }
}
