package graft.catalog

import graft.etl.DeltaLite
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.connector.catalog.{SupportsDelete, SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{Filter, InsertableRelation}
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
  * Row-level SQL: `DELETE FROM graft.db.t WHERE …` implements DSv2
  * [[SupportsDelete]] — the pushed filters convert to one Column
  * predicate and route to [[DeltaLite.deleteWhere]], the merge-on-read
  * deletion-vector path (O(matched) sidecar write, NO data file
  * rewritten — at 100 TB a delete touches positions, not files).
  * `TRUNCATE TABLE` is one empty `overwrite` commit: history and
  * time travel keep the pre-truncate snapshots. Predicates the v2
  * Filter algebra can't express (subqueries, UDF conditions) are
  * rejected at `canDeleteWhere`, never half-applied.
  *
  * Mirrors the reference's `saveAsTable`/`spark.table` workflow
  * (reference ETL_pipeline_countries.py:129-138) on Graft's own table
  * format.
  */
/** A staged table for `CREATE OR REPLACE TABLE` / `REPLACE TABLE`
  * ([[org.apache.spark.sql.connector.catalog.StagedTable]]): the
  * replace is ONE atomic DeltaLite commit — an `overwrite` in the
  * existing log when replacing (history, properties and constraints
  * survive; a concurrent reader sees the old snapshot until the
  * commit publishes), the v0 append for a fresh create. RTAS data
  * lands through the V1 write; a plain REPLACE with no query
  * publishes the declared schema with zero rows at
  * [[commitStagedChanges]]. Nothing is publishable before the single
  * commit, so [[abortStagedChanges]] has nothing to roll back —
  * crash orphans of a failed write are invisible to readers and
  * swept by vacuumOrphans.
  */
class GraftStagedTable(tableName: String, root: String,
    declaredSchema: StructType, parts: Seq[String], statsKey: Option[String],
    spark: org.apache.spark.sql.SparkSession, replacing: Boolean,
    userProps: Map[String, String] = Map.empty)
    extends Table with SupportsWrite
    with org.apache.spark.sql.connector.catalog.StagedTable {

  private val delta =
    if (replacing) DeltaLite(spark, root)
    else new DeltaLite(spark, root, statsKey = statsKey, partitionBy = parts)

  @volatile private var written = false

  override def name(): String = tableName
  override def schema(): StructType = declaredSchema

  override def partitioning(): Array[Transform] =
    parts.map(c => Expressions.identity(c)).toArray

  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    m.put("location", root)
    m.put("provider", "graft")
    m
  }

  override def capabilities(): util.Set[TableCapability] = {
    val s = new util.HashSet[TableCapability]()
    s.add(TableCapability.V1_BATCH_WRITE)
    s.add(TableCapability.TRUNCATE)
    s
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // RTAS plans a truncate-then-write; the single overwrite commit
      // IS both, so the flag needs no separate action
      override def truncate(): WriteBuilder = this
      override def build(): V1Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, ignored: Boolean): Unit = {
              if (replacing) delta.overwrite(data) else delta.append(data)
              written = true
            }
          }
      }
    }

  override def commitStagedChanges(): Unit = {
    if (!written) {
      // REPLACE/CREATE with a column list and no query: publish the
      // declared schema with zero rows, still one atomic commit
      val empty = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), declaredSchema)
      if (replacing) delta.overwrite(empty) else delta.append(empty)
    }
    // declared TBLPROPERTIES (incl. CLUSTER BY's clusteringColumns)
    // persist after the data commit — a reader between the two sees a
    // complete table that hasn't learned its properties yet, never a
    // half-built one
    if (userProps.nonEmpty) delta.setTableProperties(userProps)
  }

  override def abortStagedChanges(): Unit = ()
}

class GraftTable(tableName: String, val delta: DeltaLite,
    val asOfVersion: Option[Int] = None,
    val asOfTimestampMicros: Option[Long] = None,
    externalSchema: Option[StructType] = None,
    mergeIncoming: Boolean = false) extends Table
    with SupportsRead with SupportsWrite with SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsPartitionManagement {

  /** Anchor scan for row-level commands: `DELETE FROM` planning runs
    * the target relation through scan pushdown before routing to
    * [[deleteWhere]], which requires [[SupportsRead]] — but the scan
    * itself never executes (SELECT reads are substituted during
    * analysis by GraftCatalogReads, and DeleteFromTableExec only
    * calls deleteWhere). toBatch fails loudly if anything ever tries
    * to run it.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema()
        override def toBatch: Batch = throw new UnsupportedOperationException(
          s"$tableName reads resolve through GraftCatalogReads; " +
            "this scan only anchors row-level commands")
      }
    }

  override def name(): String = tableName

  /** Time-travel reads report the schema AS OF that snapshot (a later
    * rename/drop must not misalign the substituted read's columns).
    *
    * IDENTITY columns surface as NULLABLE here: OSS Spark's
    * TableOutputResolver has no identity fill, so `INSERT INTO t (v)`
    * must be allowed to NULL-fill the id column — the table then
    * allocates real values connector-side (DeltaLite.append) and the
    * stored schema stays non-nullable.
    */
  override def schema(): StructType = {
    val base =
      if (asOfVersion.isEmpty && asOfTimestampMicros.isEmpty) {
        // externalSchema: the writing DataFrame's schema, passed by
        // the path-based TableProvider — lets the first write CREATE
        // the table (an existing commit log always wins); with
        // `mergeSchema`, the batch's NEW columns extend the reported
        // schema so output resolution admits them (the connector-side
        // appendEvolve then widens the commit log, same rule)
        val committed = delta.schema
        val merged = (committed, externalSchema) match {
          case (Some(c), Some(e)) if mergeIncoming =>
            val have = c.fieldNames.toSet
            Some(StructType(c.fields ++
              e.fields.filterNot(f => have.contains(f.name))))
          case _ => committed.orElse(externalSchema)
        }
        merged.getOrElse(new StructType())
      } else readDf().schema
    StructType(base.fields.map(f =>
      if (f.metadata.contains("identity.start") ||
        f.metadata.contains(graft.etl.DeltaLite.GenerationExpressionKey))
        f.copy(nullable = true)
      else f))
  }

  // clustering is deliberately NOT surfaced here: Spark renders any
  // non-identity transform as `PARTITIONED BY (cluster_by(…))` in
  // SHOW CREATE TABLE, which misstates the layout — the declaration
  // round-trips through TBLPROPERTIES('clusteringColumns') instead
  override def partitioning(): Array[Transform] =
    delta.partitionColumns.map(c => Expressions.identity(c)).toArray

  /** The persisted CHECK constraints, surfaced through the DSv2
    * constraint API: SHOW CREATE TABLE prints them, DESCRIBE shows
    * them, and the analyzer knows the contract. VALID because
    * `addCheckConstraint` validated existing data before publishing;
    * ENFORCED because every data-bearing commit re-checks.
    */
  override def constraints():
      Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] = {
    import org.apache.spark.sql.connector.catalog.constraints.Constraint
    delta.checkConstraints.toSeq.sortBy(_._1).map { case (n, sql) =>
      Constraint.check(n).predicateSql(sql)
        .enforced(true)
        .validationStatus(Constraint.ValidationStatus.VALID)
        .rely(true)
        .build(): Constraint
    }.toArray
  }

  // ---- SupportsPartitionManagement: SHOW PARTITIONS ---------------
  // Partitions here are a DERIVED listing (distinct tuples from the
  // live files' dir-encoded paths — bounded log metadata, no file
  // I/O), not a managed registry: files carry their partitions, so
  // ADD/DROP PARTITION have no meaning and fail loudly.

  override def partitionSchema(): StructType = {
    val sch = schema()
    StructType(delta.partitionColumns.map(p => sch(sch.fieldIndex(p))))
  }

  private def castPartValue(raw: String,
      dt: org.apache.spark.sql.types.DataType): Any =
    if (raw == null) null
    else org.apache.spark.sql.catalyst.expressions.Cast(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(raw),
        org.apache.spark.sql.types.StringType),
      dt, Some(java.util.TimeZone.getDefault.getID)).eval()

  override def listPartitionIdentifiers(names: Array[String],
      ident: org.apache.spark.sql.catalyst.InternalRow)
      : Array[org.apache.spark.sql.catalyst.InternalRow] = {
    val pSchema = partitionSchema()
    val rows = delta.livePartitionValues().map { tuple =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        tuple.zipWithIndex.map { case ((_, raw), i) =>
          castPartValue(raw, pSchema(i).dataType)
        }.toArray)
    }
    // prefix filter: `SHOW PARTITIONS t PARTITION (c = v)`
    val nameIdx = names.map(n => pSchema.fieldIndex(n))
    rows.filter { r =>
      nameIdx.zipWithIndex.forall { case (fi, ii) =>
        val dt = pSchema(fi).dataType
        val a = r.get(fi, dt); val b = ident.get(ii, dt)
        (a == null && b == null) || (a != null && a == b)
      }
    }.toArray
  }

  override def createPartition(ident: org.apache.spark.sql.catalyst.InternalRow,
      props: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      s"$tableName: partitions are derived from file paths — " +
        "write rows instead of ADD PARTITION")

  override def dropPartition(
      ident: org.apache.spark.sql.catalyst.InternalRow): Boolean =
    throw new UnsupportedOperationException(
      s"$tableName: partitions are derived from file paths — " +
        "use DELETE FROM … WHERE instead of DROP PARTITION")

  override def replacePartitionMetadata(
      ident: org.apache.spark.sql.catalyst.InternalRow,
      props: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      s"$tableName: partition metadata is not managed")

  override def loadPartitionMetadata(
      ident: org.apache.spark.sql.catalyst.InternalRow)
      : util.Map[String, String] = util.Collections.emptyMap()

  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    // persisted TBLPROPERTIES first, catalog-derived reserved keys
    // LAST: a user SET TBLPROPERTIES('provider'='x') (or 'version' /
    // 'graft.location') must not shadow the real values DESCRIBE /
    // SHOW TBLPROPERTIES consumers read
    delta.tableProperties.foreach { case (k, v) => m.put(k, v) }
    m.put("location", delta.root)
    // `location`/`provider` are reserved keys SHOW TBLPROPERTIES
    // filters out — surface the root under a visible key too
    m.put("graft.location", delta.root)
    m.put("provider", "graft")
    delta.latestVersion.foreach(v => m.put("version", v.toString))
    m
  }

  override def capabilities(): util.Set[TableCapability] = {
    val s = new util.HashSet[TableCapability]()
    s.add(TableCapability.BATCH_READ)
    // BATCH_WRITE gates DataFrameWriter.save(path) (it never accepts
    // the V1 capability alone); the write still EXECUTES through the
    // V1Write below — the strategy picks the exec from the Write's
    // type, not this set
    s.add(TableCapability.BATCH_WRITE)
    s.add(TableCapability.V1_BATCH_WRITE)
    s.add(TableCapability.TRUNCATE)
    s.add(TableCapability.OVERWRITE_BY_FILTER)
    s.add(TableCapability.STREAMING_WRITE)
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

  /** Source Filter → Column, total over the shapes `DELETE FROM`
    * pushes; None marks an untranslatable filter (canDeleteWhere then
    * refuses the whole delete — SQL semantics are all-or-nothing).
    */
  private def toColumn(f: Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case sources.StringContains(a, v) => Some(col(a).contains(v))
    case sources.And(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case sources.Or(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case sources.Not(c) => toColumn(c).map(not)
    case sources.AlwaysTrue() => Some(lit(true))
    case sources.AlwaysFalse() => Some(lit(false))
    case _ => None
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    asOfVersion.isEmpty && asOfTimestampMicros.isEmpty &&
      filters.forall(toColumn(_).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(asOfVersion.isEmpty && asOfTimestampMicros.isEmpty,
      s"cannot DELETE from a time-travel read of $tableName")
    // DELETE semantics: remove rows where the predicate is TRUE; a
    // NULL predicate keeps the row, which the Column conversion
    // already encodes (filter keeps only true)
    val cond = filters.flatMap(toColumn(_)).reduceOption(_ && _)
      .getOrElse(lit(true))
    delta.deleteWhere(cond)
  }

  /** TRUNCATE TABLE: one empty overwrite commit — the pre-truncate
    * snapshots stay time-travelable, nothing is vacuumed here.
    */
  override def truncateTable(): Boolean = {
    require(asOfVersion.isEmpty && asOfTimestampMicros.isEmpty,
      s"cannot TRUNCATE a time-travel read of $tableName")
    val sch = delta.schema.getOrElse(new StructType())
    val spark = delta.spark
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), sch)
    delta.overwrite(empty)
    true
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(asOfVersion.isEmpty && asOfTimestampMicros.isEmpty,
      s"cannot write to a time-travel read of $tableName")
    // SupportsOverwrite: `INSERT OVERWRITE t PARTITION (p = 'x')`
    // plans OverwriteByExpression with the static partition spec as
    // filters — routed to replaceWhere, the partition-scoped atomic
    // swap (membership from path metadata, non-replaced partitions
    // keep their exact files). AlwaysTrue (plain INSERT OVERWRITE)
    // stays the whole-table overwrite commit.
    new WriteBuilder with SupportsTruncate with SupportsOverwrite {
      private var overwriteAll = false
      private var overwriteCond: Option[Column] = None
      override def truncate(): WriteBuilder = { overwriteAll = true; this }
      override def overwrite(filters: Array[Filter]): WriteBuilder = {
        val conds = filters.toSeq.map(f => toColumn(f).getOrElse(
          throw new UnsupportedOperationException(
            s"INSERT OVERWRITE filter $f is not translatable; " +
              "use DeltaLite.replaceWhere for this shape")))
        if (conds.isEmpty || filters.exists(_ == sources.AlwaysTrue()))
          overwriteAll = true
        else overwriteCond = Some(conds.reduce(_ && _))
        this
      }
      override def build(): V1Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, ignored: Boolean): Unit =
              if (overwriteAll) delta.overwrite(data)
              else overwriteCond match {
                case Some(cond) => delta.replaceWhere(data, cond)
                case None =>
                  // mergeSchema appends THROUGH schema evolution: new
                  // columns widen the log, old files read them as null
                  if (mergeIncoming) delta.appendEvolve(data)
                  else delta.append(data)
              }
          }

        /** `df.writeStream.toTable("graft.db.t")` — per-task parquet
          * writers + one txn-stamped commit per epoch (exactly-once
          * across restarts, like the DeltaSink foreachBatch path).
          * Complete output mode (truncate) publishes overwrite
          * commits. Partitioned / identity / generated tables need
          * the append path's driver logic and are rejected loudly —
          * use [[graft.streaming.DeltaSink]]'s foreachBatch writers.
          */
        override def toStreaming
            : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
          val committed = delta.schema.getOrElse(sys.error(
            s"streaming write needs an existing table at ${delta.root}"))
          require(delta.partitionColumns.isEmpty,
            s"streaming writes to PARTITIONED table $tableName are not " +
              "supported; use DeltaSink.compactingWriter/foreachBatch")
          require(!committed.fields.exists(f =>
            f.metadata.contains("identity.start") ||
              f.metadata.contains(graft.etl.DeltaLite.GenerationExpressionKey)),
            s"streaming writes to $tableName: identity/generated columns " +
              "allocate in the batch append path; use foreachBatch with " +
              "DeltaLite.append")
          val declared = info.schema()
          require(committed.fields.map(f => (f.name, f.dataType)).toSeq ==
            declared.fields.map(f => (f.name, f.dataType)).toSeq,
            s"streaming write schema ${declared.simpleString} does not " +
              s"match table $tableName ${committed.simpleString}")
          val mapping = delta.columnMapping
          val phys = org.apache.spark.sql.types.StructType(
            committed.fields.map(f =>
              f.copy(name = mapping.getOrElse(f.name, f.name))))
          val spark = delta.spark
          new org.apache.spark.sql.graftbridge.GraftStreamingWrite(
            delta, phys, delta.root, info.queryId(), overwriteAll,
            new org.apache.spark.util.SerializableConfiguration(
              spark.sessionState.newHadoopConf()))
        }
      }
    }
  }
}
