package org.apache.spark.sql.graftbridge

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.{array_position, coalesce, col, element_at, lit, regexp_extract, when}
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
  * Two sourcing modes:
  *  - EAGER: a driver-materialized entry list (small tables, legacy
  *    logs) — the round-9 shape.
  *  - LAZY ([[LazyEntriesSource]]): the live set stays a DataFrame
  *    over the checkpoint/sidecar entries parquet; when Catalyst
  *    hands this index the pushed filters, the pruning predicates run
  *    IN THE SPARK READ of that parquet and only the surviving
  *    entries are collected — a point lookup on a checkpointed
  *    million-file table drives O(survivors) driver rows, not O(live
  *    files). The driver-side [[DeltaLiteFileIndex.survives]] check
  *    re-runs on the survivors for exactness (and for filter shapes
  *    the DataFrame translation conservatively skipped).
  *
  * Lives under the spark.sql namespace because the datasource
  * internals (LogicalRelation, HadoopFsRelation) are private[sql] —
  * the standard extension-library placement (see [[Bridge]]).
  */
final class LazyEntriesSource(
    val prune: Seq[Expression] =>
      Seq[(String, Option[Long], Map[String, (Option[String], Option[String])])],
    val allPaths: () => Array[String],
    val totalBytes: () => Long)

class DeltaLiteFileIndex(
    spark: SparkSession,
    root: Path,
    entries: Seq[(String, Option[Long], Map[String, (Option[String], Option[String])])],
    dataSchema: StructType,
    lazySource: Option[LazyEntriesSource] = None) extends FileIndex {

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
  protected def toStatuses(
      es: Seq[(String, Option[Long], Map[String, (Option[String], Option[String])])])
      : Seq[(FileStatus, Map[String, (Option[String], Option[String])])] =
    es.map { case (p, sz, ranges) =>
      val st = sz match {
        case Some(len) =>
          new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, new Path(p))
        case None =>
          DeltaLiteFileIndex.fallbackStats.incrementAndGet()
          fs.getFileStatus(new Path(p))
      }
      (st, ranges)
    }

  private lazy val statuses = toStatuses(entries)

  // lazy mode: survivors per pushed-filter set (a plan may list
  // several times — AQE re-planning, metadata queries)
  private val pruned = scala.collection.concurrent.TrieMap
    .empty[String, Seq[(FileStatus, Map[String, (Option[String], Option[String])])]]
  private lazy val lazyBytes = lazySource.map(_.totalBytes()).getOrElse(0L)
  private lazy val lazyPaths = lazySource.map(_.allPaths()).getOrElse(Array.empty[String])

  override def rootPaths: Seq[Path] = Seq(root)
  override def partitionSchema: StructType = StructType(Nil)
  override def inputFiles: Array[String] =
    if (lazySource.isDefined) lazyPaths else entries.map(_._1).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long =
    if (lazySource.isDefined) lazyBytes else statuses.map(_._1.getLen).sum

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
  protected def survives(
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
      // OR prunes only when BOTH branches prune the file
      case Or(l, r) => survives(ranges, l) || survives(ranges, r)
      case EqualTo(a: Attribute, l: Literal) =>
        range(a).forall { case (lo, hi, dt) =>
          litv(l).forall(v => cmp(dt, v, lo) >= 0 && cmp(dt, v, hi) <= 0) }
      case EqualTo(l: Literal, a: Attribute) =>
        range(a).forall { case (lo, hi, dt) =>
          litv(l).forall(v => cmp(dt, v, lo) >= 0 && cmp(dt, v, hi) <= 0) }
      // IN-list: the file survives iff ANY member can be inside its
      // range (a null member keeps the file — forall over None)
      case In(a: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) &&
          vs.size <= 256 =>
        range(a).forall { case (lo, hi, dt) =>
          vs.exists(l => litv(l.asInstanceOf[Literal]).forall(v =>
            cmp(dt, v, lo) >= 0 && cmp(dt, v, hi) <= 0)) }
      // large resolved IN: Catalyst rewrites to InSet of internal values
      case InSet(a: Attribute, hset) if hset.size <= 4096 =>
        range(a).forall { case (lo, hi, dt) =>
          hset.exists(v =>
            litv(Literal(v, a.dataType)).forall(s =>
              cmp(dt, s, lo) >= 0 && cmp(dt, s, hi) <= 0)) }
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
    val base = lazySource match {
      case Some(src) =>
        val key = dataFilters.map(_.semanticHash()).sorted.mkString(",")
        pruned.getOrElseUpdate(key, toStatuses(src.prune(dataFilters)))
      case None => statuses
    }
    val kept =
      if (dataFilters.isEmpty) base
      else base.filter { case (_, ranges) =>
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

/** Skipping index for files whose PARTITION COLUMN BYTES ARE NOT IN
  * THE FILES — adopted Delta tables, where the values live only in the
  * transaction log ([[graft.etl.DeltaInterop]]). The relation declares
  * a real `partitionSchema`, so Spark itself
  *  - appends the partition columns to every row from this index's
  *    per-tuple [[PartitionDirectory]] values (typed injection inside
  *    the scan — zero joins, codegen'd), and
  *  - splits pushed filters into partitionFilters (evaluated here
  *    against the tuple rows — partition elimination without touching
  *    a single file) and dataFilters (pruned per file via the same
  *    conservative range check as the flat index).
  * One relation serves ANY layout — hive-pathed, log-only values,
  * absolute URIs — the shape Delta's own TahoeFileIndex uses.
  *
  * `partVals` is aligned with `entries` (same order): string-encoded
  * values per partition column; a missing key (or null value) is the
  * null/default partition. Values cast to the declared type through
  * the session time zone — the same resolution a Delta reader
  * performs.
  */
class DeltaLitePartitionedFileIndex(
    spark: SparkSession,
    root: Path,
    entries: Seq[(String, Option[Long], Map[String, (Option[String], Option[String])])],
    partVals: Seq[Map[String, String]],
    dataSchema: StructType,
    partSchema: StructType)
  extends DeltaLiteFileIndex(spark, root, entries, dataSchema) {

  require(entries.length == partVals.length,
    s"entries (${entries.length}) and partition-value rows " +
      s"(${partVals.length}) must align")

  override def partitionSchema: StructType = partSchema

  /** Distinct partition tuples with their typed rows and member files
    * (+ per-file data-column ranges). Grouping keys on the STRING
    * tuple; the typed row materializes once per tuple.
    */
  private lazy val groups: Seq[(InternalRow,
      Seq[(FileStatus, Map[String, (Option[String], Option[String])])])] = {
    val byTuple = entries.zip(partVals).groupBy { case (_, vals) =>
      partSchema.fields.map(f => vals.getOrElse(f.name, null)).toSeq
    }
    byTuple.toSeq.sortBy(_._1.map(String.valueOf).mkString(" "))
      .map { case (tuple, members) =>
        (DeltaLiteScan.partitionRow(spark, partSchema, tuple),
          toStatuses(members.map(_._1)))
      }
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val pred =
      DeltaLiteScan.partitionPredicate(partSchema, partitionFilters)
    groups.flatMap { case (row, members) =>
      if (pred.exists(!_.eval(row))) None
      else {
        val kept =
          if (dataFilters.isEmpty) members
          else members.filter { case (_, ranges) =>
            ranges.isEmpty || dataFilters.forall(f => survives(ranges, f))
          }
        if (kept.isEmpty) None
        else Some(PartitionDirectory(row, kept.map(_._1).toArray))
      }
    }
  }
}

/** Lazy twin of [[DeltaLitePartitionedFileIndex]]: the entry set stays
  * a DataFrame over the checkpoint/sidecar entries parquet. Each
  * planned scan hands BOTH its partition filters and data filters to
  * `prune` (partition predicates translate over the log-recorded
  * per-file [v,v] ranges, the same pushdown as stats), collects only
  * survivors WITH their partition-value tuples, and builds the typed
  * [[PartitionDirectory]] groups from those: a partition-filtered
  * point lookup on a checkpointed million-file table drives
  * O(survivors) driver rows while the scan still injects the partition
  * columns natively.
  */
final class LazyPartEntriesSource(
    val prune: Seq[Expression] =>
      Seq[((String, Option[Long], Map[String, (Option[String], Option[String])]),
        Map[String, String])],
    val allPaths: () => Array[String],
    val totalBytes: () => Long)

class DeltaLiteLazyPartitionedFileIndex(
    spark: SparkSession,
    root: Path,
    source: LazyPartEntriesSource,
    dataSchema: StructType,
    partSchema: StructType)
  extends DeltaLiteFileIndex(spark, root, Nil, dataSchema) {

  override def partitionSchema: StructType = partSchema
  private lazy val lpPaths = source.allPaths()
  private lazy val lpBytes = source.totalBytes()
  override def inputFiles: Array[String] = lpPaths
  override def sizeInBytes: Long = lpBytes

  private val lpCache = scala.collection.concurrent.TrieMap
    .empty[String, Seq[PartitionDirectory]]

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val key = (partitionFilters ++ dataFilters)
      .map(_.semanticHash()).sorted.mkString(",")
    lpCache.getOrElseUpdate(key, {
      val prunedE = source.prune(partitionFilters ++ dataFilters)
      // exact driver-side re-check of the partition predicate on the
      // survivors (the DF-side translation is conservative, not
      // complete), then per-file data-range survival
      val pred =
        DeltaLiteScan.partitionPredicate(partSchema, partitionFilters)
      val byTuple = prunedE.groupBy { case (_, vals) =>
        partSchema.fields.map(f => vals.getOrElse(f.name, null)).toSeq
      }
      byTuple.toSeq.sortBy(_._1.map(String.valueOf).mkString(" "))
        .flatMap { case (tuple, members) =>
          val row = DeltaLiteScan.partitionRow(spark, partSchema, tuple)
          if (pred.exists(!_.eval(row))) None
          else {
            val kept0 = members.map(_._1)
            val kept =
              if (dataFilters.isEmpty) kept0
              else kept0.filter { case (_, _, ranges) =>
                ranges.isEmpty || dataFilters.forall(f => survives(ranges, f))
              }
            if (kept.isEmpty) None
            else Some(PartitionDirectory(row,
              toStatuses(kept).map(_._1).toArray))
          }
        }
    })
  }
}


object DeltaLiteScan {

  /** Typed InternalRow for one partition tuple: each string value cast
    * to its declared type through the DEFAULT session time zone (the
    * same resolution a Delta reader performs); null = the null/default
    * partition.
    */
  def partitionRow(spark: SparkSession, partSchema: StructType,
      tuple: Seq[String]): InternalRow =
    InternalRow.fromSeq(
      partSchema.fields.zip(tuple).map { case (f, v) =>
        if (v == null) null
        else Cast(Literal.create(v, StringType), f.dataType,
          Some(spark.sessionState.conf.sessionLocalTimeZone)).eval(null)
      }.toIndexedSeq)

  /** Interpreted predicate over a partition tuple row, bound to
    * `partSchema`'s field order — how a FileIndex evaluates pushed
    * partitionFilters against its tuples (tuple counts are
    * metadata-sized; codegen would cost more than it saves).
    */
  def partitionPredicate(partSchema: StructType,
      partitionFilters: Seq[Expression])
      : Option[org.apache.spark.sql.catalyst.expressions.BasePredicate] = {
    val pred = partitionFilters.reduceOption(And).map { e =>
      val bound = e.transform {
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
          org.apache.spark.sql.catalyst.expressions.BoundReference(
            partSchema.fieldIndex(a.name), a.dataType, a.nullable)
      }
      org.apache.spark.sql.catalyst.expressions.Predicate
        .createInterpreted(bound)
    }
    pred.foreach(_.initialize(0))
    pred
  }

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

  /** Normalize an UNRESOLVED user predicate (the ColumnNode converter
    * yields `UnresolvedFunction("and"/"="/">"/…)` nodes, not the
    * resolved comparison classes [[pruneCondition]] matches) into the
    * equivalent catalyst comparisons where the shape is simple;
    * anything unrecognized passes through untouched (and translates to
    * no pruning — conservative).
    */
  def normalizePredicate(e: Expression): Expression = e match {
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.nameParts.last.equalsIgnoreCase("in") && f.arguments.size >= 2 =>
      In(normalizePredicate(f.arguments.head),
        f.arguments.tail.map(normalizePredicate))
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.arguments.size == 2 =>
      val l = normalizePredicate(f.arguments.head)
      val r = normalizePredicate(f.arguments(1))
      f.nameParts.last.toLowerCase match {
        case "and" => And(l, r)
        case "or" => Or(l, r)
        case "=" | "==" => EqualTo(l, r)
        case ">" => GreaterThan(l, r)
        case ">=" => GreaterThanOrEqual(l, r)
        case "<" => LessThan(l, r)
        case "<=" => LessThanOrEqual(l, r)
        case _ => e
      }
    case other => other
  }

  /** Translate pushed-down data filters into a survival predicate over
    * the ENTRIES PARQUET's own columns (min/max/key_col, the extra
    * per-column arrays, and partition values regexp-extracted from the
    * path) — the DataFrame half of lazy pruning. Strictly conservative:
    * unsupported filter shapes contribute nothing, inapplicable or
    * null ranges keep the row, a failed typed cast keeps the row
    * (coalesce true). The driver-side survives() re-checks survivors,
    * so this only ever has to be sound, never complete.
    *
    * Name resolution is caller-supplied so the same translation serves
    * physical-named scan filters (readIndexed) AND logical-named
    * user predicates (deleteWhere/updateWhere):
    *  - `primaryKeyName`: attribute → the `key_col` value that
    *    validates the entry's primary min/max for it (a historically
    *    different key must not prune);
    *  - `extraName`: attribute → the name its extra ranges were
    *    recorded under;
    *  - `partDir`: attribute → the hive dir name (physical id) its
    *    partition value is path-encoded as.
    */
  def pruneCondition(spark: SparkSession, filters: Seq[Expression],
      dataSchema: StructType, primaryKeyName: Map[String, String],
      extraName: Map[String, String], partDir: Map[String, String],
      partPrefix: String,
      // attribute -> its CURRENT physical id: entries stamped with
      // physical ids (physstats rev: key_phys / extra_phys columns)
      // match by the stable id — immune to rename alias swaps; rows
      // with null stamps fall back to the name rule above. Callers
      // that speak physical names pass the identity map.
      physName: Map[String, String] = Map.empty): Option[Column] = {
    val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
    def litv(l: Literal): Option[String] =
      Option(Cast(l, StringType, tz).eval(null)).map(_.toString)
    def colType(c: String): Option[DataType] =
      dataSchema.fields.find(_.name == c).map(_.dataType)
    // label matchers: stamped rows by physical id, unstamped by name
    def primaryLabelOk(p: String, keyName: String): Column =
      physName.get(p) match {
        case Some(ph) => when(col("key_phys").isNotNull,
          col("key_phys") === lit(ph))
          .otherwise(col("key_col") === lit(keyName))
        case None => col("key_col") === lit(keyName)
      }
    def extraPos(p: String, en: String): Column =
      physName.get(p) match {
        case Some(ph) => when(col("extra_phys").isNotNull,
          array_position(col("extra_phys"), lit(ph)))
          .otherwise(array_position(col("extra_cols"), en))
        case None => array_position(col("extra_cols"), en)
      }
    // extras lookup for one attribute (shared by the partition
    // fallthrough below and the no-partition chain)
    def extraRangeOf(p: String): Option[(Column, Column, Column)] =
      extraName.get(p).map { en =>
        val pos = extraPos(p, en)
        val lo = element_at(col("extra_mins"), pos.cast("int"))
        val hi = element_at(col("extra_maxs"), pos.cast("int"))
        (lo, hi, col("extra_cols").isNotNull && pos > 0 &&
          lo.isNotNull && hi.isNotNull)
      }
    // (lo, hi, applicable) for one attribute, mirroring the driver
    // map's precedence: partition value > primary stats > extra range
    def range(p: String): Option[(Column, Column, Column)] =
      partDir.get(p).map { dir =>
        val pv = regexp_extract(col("path"),
          java.util.regex.Pattern.quote(s"$partPrefix$dir") + "=([^/]+)", 1)
        // %-escaped values stay driver-side (unescaping in SQL is not
        // worth it; survives() handles them exactly)
        val pathApp = pv =!= lit("") && !pv.contains("%") &&
          pv =!= lit(ExternalCatalogUtils.DEFAULT_PARTITION_NAME)
        // fall through to the RECORDED [v,v] extras when the path
        // doesn't encode the value — adopted Delta files carry their
        // partition values in the log, not in `__p_` segments, and
        // without this their partition filters would only prune in the
        // driver re-check, collecting O(all adopted files) rows
        extraRangeOf(p) match {
          case Some((elo, ehi, eapp)) =>
            (when(pathApp, pv).otherwise(when(eapp, elo)),
              when(pathApp, pv).otherwise(when(eapp, ehi)),
              pathApp || eapp)
          case None => (pv, pv, pathApp)
        }
      }.orElse(primaryKeyName.get(p).map { keyName =>
        val app = primaryLabelOk(p, keyName) &&
          col("min").isNotNull && col("max").isNotNull
        (col("min"), col("max"),
          // the primary range OR the extra ranges may carry p's bounds
          // — fall through to extra when the primary doesn't apply
          app)
      }.map { case base @ (_, _, primaryApp) =>
        extraRangeOf(p) match {
          case None => base
          case Some((elo, ehi, extraApp)) =>
            (when(primaryApp, col("min")).otherwise(when(extraApp, elo)),
              when(primaryApp, col("max")).otherwise(when(extraApp, ehi)),
              primaryApp || extraApp)
        }
      }).orElse(extraRangeOf(p))
    def typed(c: Column, dt: DataType): Column = dt match {
      case StringType => c
      case _ => c.cast(dt)
    }
    def test(a: Attribute, l: Literal)(
        overlap: (Column, Column, Column) => Column): Option[Column] =
      for { (lo, hi, app) <- range(a.name); dt <- colType(a.name); v <- litv(l) }
        yield !app || coalesce(
          overlap(typed(lo, dt), typed(hi, dt), typed(lit(v), dt)), lit(true))
    def one(f: Expression): Option[Column] = f match {
      case And(l, r) => (one(l), one(r)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (a, b) => a.orElse(b)
      }
      // OR prunes only when BOTH branches translate (a side kept whole
      // would otherwise be wrongly narrowed)
      case Or(l, r) => (one(l), one(r)) match {
        case (Some(a), Some(b)) => Some(a || b)
        case _ => None
      }
      case EqualTo(a: Attribute, l: Literal) =>
        test(a, l)((lo, hi, v) => v >= lo && v <= hi)
      case EqualTo(l: Literal, a: Attribute) =>
        test(a, l)((lo, hi, v) => v >= lo && v <= hi)
      // bounded IN-list: survive iff any member can be in range —
      // (!app || m1) || (!app || m2) ≡ !app || (m1 || m2); every
      // member must translate or the whole IN keeps the file
      case In(a: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) &&
          vs.size <= 64 =>
        val ts = vs.map(l => test(a, l.asInstanceOf[Literal])(
          (lo, hi, v) => v >= lo && v <= hi))
        if (ts.nonEmpty && ts.forall(_.isDefined)) Some(ts.flatten.reduce(_ || _))
        else None
      case GreaterThan(a: Attribute, l: Literal) =>
        test(a, l)((_, hi, v) => hi > v)
      case GreaterThanOrEqual(a: Attribute, l: Literal) =>
        test(a, l)((_, hi, v) => hi >= v)
      case LessThan(a: Attribute, l: Literal) =>
        test(a, l)((lo, _, v) => lo < v)
      case LessThanOrEqual(a: Attribute, l: Literal) =>
        test(a, l)((lo, _, v) => lo <= v)
      case _ => None
    }
    filters.flatMap(one(_)).reduceOption(_ && _)
  }

  /** DataFrame over the live files through the skipping index.
    * `entries` carries each file's recorded byte size (None only for
    * pre-size logs → one stat fallback) and per-column [min, max]
    * ranges (stats key and/or partition values), keyed by PHYSICAL
    * name.
    */
  def relation(spark: SparkSession, root: Path,
      entries: Seq[(String, Option[Long], Map[String, (Option[String], Option[String])])],
      schema: StructType): DataFrame =
    mkRelation(spark, new DeltaLiteFileIndex(spark, root, entries, schema),
      schema)

  /** DataFrame over the live files through a LAZY skipping index: the
    * entry set stays on disk; each planned scan hands its pushed
    * filters to `source.prune`, which evaluates them in a Spark read
    * of the entries parquet and collects only survivors.
    */
  def lazyRelation(spark: SparkSession, root: Path,
      source: LazyEntriesSource, schema: StructType): DataFrame =
    mkRelation(spark,
      new DeltaLiteFileIndex(spark, root, Nil, schema, Some(source)), schema)

  private def mkRelation(spark: SparkSession, index: DeltaLiteFileIndex,
      schema: StructType): DataFrame = {
    val rel = HadoopFsRelation(index, partitionSchema = StructType(Nil),
      dataSchema = schema, bucketSpec = None,
      fileFormat = new ParquetFileFormat, options = Map.empty)(spark)
    Bridge.ofRows(spark, LogicalRelation(rel, isStreaming = false))
  }

  /** DataFrame over files whose partition columns are INJECTED from
    * per-file metadata values (adopted Delta layouts — the bytes are
    * not in the files). Output columns: `dataSchema` fields then
    * `partSchema` fields; callers reorder to the declared schema.
    * Partition filters prune tuples driver-side before any file is
    * touched; data filters prune per file through the recorded ranges.
    */
  def partitionedRelation(spark: SparkSession, root: Path,
      entries: Seq[(String, Option[Long], Map[String, (Option[String], Option[String])])],
      partVals: Seq[Map[String, String]],
      dataSchema: StructType, partSchema: StructType): DataFrame = {
    val index = new DeltaLitePartitionedFileIndex(spark, root, entries,
      partVals, dataSchema, partSchema)
    val rel = HadoopFsRelation(index, partitionSchema = partSchema,
      dataSchema = dataSchema, bucketSpec = None,
      fileFormat = new ParquetFileFormat, options = Map.empty)(spark)
    Bridge.ofRows(spark, LogicalRelation(rel, isStreaming = false))
  }

  /** Lazy variant of [[partitionedRelation]] — entries stay in the
    * checkpoint/sidecar parquet; see [[DeltaLiteLazyPartitionedFileIndex]].
    */
  def lazyPartitionedRelation(spark: SparkSession, root: Path,
      source: LazyPartEntriesSource,
      dataSchema: StructType, partSchema: StructType): DataFrame = {
    val index = new DeltaLiteLazyPartitionedFileIndex(spark, root, source,
      dataSchema, partSchema)
    val rel = HadoopFsRelation(index, partitionSchema = partSchema,
      dataSchema = dataSchema, bucketSpec = None,
      fileFormat = new ParquetFileFormat, options = Map.empty)(spark)
    Bridge.ofRows(spark, LogicalRelation(rel, isStreaming = false))
  }
}
