package org.apache.spark.sql.graftbridge

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._

/** Scan-integrated file skipping for DeltaLite tables — the same
  * integration shape the Delta connector uses (a custom [[FileIndex]]
  * served into a HadoopFsRelation): per-file [min, max] ranges prune
  * files DURING scan planning, driven by the query's own pushed-down
  * data filters. Ranges come from two metadata sources, unified into
  * one per-column map so one survival check serves both:
  *  - the commit log's per-file stats on the table's stats key, and
  *  - the hive-layout PARTITION VALUES parsed from each file's path
  *    (a partition value is the degenerate range [v, v]) — partition
  *    elimination without listing a single pruned directory's files.
  * No manual pre-filtering: `WHERE key = x` on the DataFrame is
  * enough, and the FileSourceScan's numFiles metric reflects the skip.
  *
  * Lives under the spark.sql namespace because the datasource
  * internals (LogicalRelation, HadoopFsRelation) are private[sql] —
  * the standard extension-library placement (see [[Bridge]]).
  */
class DeltaLiteFileIndex(
    spark: SparkSession,
    root: Path,
    entries: Seq[(String, Option[Long], Map[String, (Option[String], Option[String])])],
    dataSchema: StructType) extends FileIndex {

  private val fs = root.getFileSystem(
    spark.sessionState.newHadoopConf())

  /** FileStatus per live file, built from the commit log's recorded
    * byte size — ZERO filesystem round trips when the log carries
    * sizes (it does for every commit since the size field landed). A
    * per-file getFileStatus here is O(files) NameNode/S3 HEAD calls
    * per table open — millions at scale — so the stat is strictly a
    * pre-size-log fallback, counted for the regression spec.
    * modTime/blockSize are synthetic (0/128MB): split planning uses
    * maxPartitionBytes, not the status block size, and nothing
    * downstream of a custom FileIndex consults modTime.
    */
  private lazy val statuses
      : Seq[(FileStatus, Map[String, (Option[String], Option[String])])] =
    entries.map { case (p, sz, ranges) =>
      val st = sz match {
        case Some(len) =>
          new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, new Path(p))
        case None =>
          DeltaLiteFileIndex.fallbackStats.incrementAndGet()
          fs.getFileStatus(new Path(p))
      }
      (st, ranges)
    }

  override def rootPaths: Seq[Path] = Seq(root)
  override def partitionSchema: StructType = StructType(Nil)
  override def inputFiles: Array[String] = entries.map(_._1).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = statuses.map(_._1.getLen).sum

  private def colType(c: String): Option[DataType] =
    dataSchema.fields.find(_.name == c).map(_.dataType)

  /** Typed compare of the stringified stats (same encoding the commit
    * log records — see DeltaLite.commit's stringify note; partition
    * values reach the identical form via a string cast of the column).
    */
  private def cmp(dt: DataType, a: String, b: String): Int = dt match {
    case LongType | IntegerType | ShortType | ByteType =>
      java.lang.Long.compare(a.toLong, b.toLong)
    case DoubleType | FloatType => java.lang.Double.compare(a.toDouble, b.toDouble)
    case _: DecimalType => new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
    case _ => a.compareTo(b) // string/date/timestamp stringify in order
  }

  /** Conservative per-file survival under one pushed filter: only
    * simple (col ⊙ literal) shapes on a column with a recorded range
    * prune; anything else keeps the file. Null stats keep the file
    * (correctness over skipping).
    */
  private def survives(
      ranges: Map[String, (Option[String], Option[String])],
      filter: Expression): Boolean = {
    // The literal must reach the SAME string form the ranges were
    // recorded in (a Spark string cast at commit time): a raw
    // Literal.value.toString would render dates/timestamps in Catalyst
    // internal form (days-int / micros-long) and the lexical fallback
    // would silently prune files that contain matching rows. A null
    // literal is conservative-kept (forall over None is true).
    def litv(l: Literal): Option[String] =
      Option(Cast(l, org.apache.spark.sql.types.StringType,
        Some(spark.sessionState.conf.sessionLocalTimeZone)).eval(null))
        .map(_.toString)
    def range(a: Attribute): Option[(String, String, DataType)] =
      for {
        (mnO, mxO) <- ranges.get(a.name)
        mn <- mnO; mx <- mxO
        dt <- colType(a.name)
      } yield (mn, mx, dt)
    filter match {
      case And(l, r) => survives(ranges, l) && survives(ranges, r)
      case EqualTo(a: Attribute, l: Literal) =>
        range(a).forall { case (lo, hi, dt) =>
          litv(l).forall(v => cmp(dt, v, lo) >= 0 && cmp(dt, v, hi) <= 0) }
      case EqualTo(l: Literal, a: Attribute) =>
        range(a).forall { case (lo, hi, dt) =>
          litv(l).forall(v => cmp(dt, v, lo) >= 0 && cmp(dt, v, hi) <= 0) }
      case GreaterThan(a: Attribute, l: Literal) =>
        range(a).forall { case (_, hi, dt) =>
          litv(l).forall(v => cmp(dt, hi, v) > 0) }
      case GreaterThanOrEqual(a: Attribute, l: Literal) =>
        range(a).forall { case (_, hi, dt) =>
          litv(l).forall(v => cmp(dt, hi, v) >= 0) }
      case LessThan(a: Attribute, l: Literal) =>
        range(a).forall { case (lo, _, dt) =>
          litv(l).forall(v => cmp(dt, lo, v) < 0) }
      case LessThanOrEqual(a: Attribute, l: Literal) =>
        range(a).forall { case (lo, _, dt) =>
          litv(l).forall(v => cmp(dt, lo, v) <= 0) }
      case _ => true
    }
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept =
      if (dataFilters.isEmpty) statuses
      else statuses.filter { case (_, ranges) =>
        ranges.isEmpty || dataFilters.forall(f => survives(ranges, f))
      }
    Seq(PartitionDirectory(InternalRow.empty, kept.map(_._1).toArray))
  }
}

object DeltaLiteFileIndex {
  /** Count of per-file getFileStatus fallbacks (pre-size-log entries
    * only) — the "zero stats on a warm open" spec asserts this never
    * moves for tables whose log records sizes.
    */
  val fallbackStats = new java.util.concurrent.atomic.AtomicLong(0)
}

object DeltaLiteScan {

  /** Partition values encoded in `path`'s hive-layout segments for
    * `partCols` (PHYSICAL column names, matched against the write
    * path's `__p_<phys>=<value>` dirs). Values are unescaped with the
    * same util Spark escaped them with; the hive null sentinel maps to
    * no-range (conservative keep).
    */
  def partitionValues(path: String, partPrefix: String,
      partCols: Seq[String]): Map[String, String] = {
    val segs = path.split('/').filter(_.contains('='))
    segs.flatMap { s =>
      val i = s.indexOf('=')
      val dir = s.substring(0, i)
      val raw = s.substring(i + 1)
      if (!dir.startsWith(partPrefix)) None
      else {
        val phys = dir.stripPrefix(partPrefix)
        if (!partCols.contains(phys) ||
          raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) None
        else Some(phys -> ExternalCatalogUtils.unescapePathName(raw))
      }
    }.toMap
  }

  /** DataFrame over the live files through the skipping index.
    * `entries` carries each file's recorded byte size (None only for
    * pre-size logs → one stat fallback) and per-column [min, max]
    * ranges (stats key and/or partition values), keyed by PHYSICAL
    * name.
    */
  def relation(spark: SparkSession, root: Path,
      entries: Seq[(String, Option[Long], Map[String, (Option[String], Option[String])])],
      schema: StructType): DataFrame = {
    val index = new DeltaLiteFileIndex(spark, root, entries, schema)
    val rel = HadoopFsRelation(index, partitionSchema = StructType(Nil),
      dataSchema = schema, bucketSpec = None,
      fileFormat = new ParquetFileFormat, options = Map.empty)(spark)
    Bridge.ofRows(spark, LogicalRelation(rel, isStreaming = false))
  }
}
