package graft.catalog

import graft.etl.DeltaLite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util
import scala.jdk.CollectionConverters._

/** The analyst-facing catalog: DeltaLite tables addressed by NAME from
  * plain SQL — the reference's whole load/query workflow is
  * catalog-addressed (`spark.table("delta_tables.…")`,
  * `.saveAsTable(…)`, `create database if not exists delta_tables`;
  * reference ETL_pipeline_countries.py:129-168, README.md:250-258).
  *
  * Register with
  * {{{
  *   spark.sql.catalog.graft           = graft.catalog.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /path/to/warehouse
  *   spark.sql.extensions              = graft.GraftExtensions
  * }}}
  * (the extensions inject the read-substitution rule, the same
  * two-conf deployment Delta's connector uses). Then:
  * {{{
  *   CREATE NAMESPACE graft.gold
  *   CREATE TABLE graft.gold.t (k BIGINT, v STRING) PARTITIONED BY (v)
  *   INSERT INTO graft.gold.t SELECT …
  *   SELECT … FROM graft.gold.t [VERSION AS OF 3]
  *   ALTER TABLE graft.gold.t RENAME COLUMN v TO txt
  *   CALL graft.system.optimize(`table` => 'gold.t')
  * }}}
  *
  * Layout: one DeltaLite root per table at `<warehouse>/<db>/<table>`;
  * a table EXISTS iff its `_log` directory does. Metadata ops are
  * O(log) — no Hive metastore, the commit log IS the metadata (the
  * lakehouse catalog-from-storage shape).
  *
  * Maintenance DDL the SQL grammar lacks ships as CALL procedures
  * (`optimize`, `optimize_where`, `vacuum`, `vacuum_orphans`,
  * `restore`, `zorder`, `analyze`, `checkpoint`, `clean_log`,
  * `add_constraint`, `drop_constraint`, `copy_into`, `clone`; row-set
  * procedures `history`, `detail`, `table_changes`) — the Spark 4
  * [[ProcedureCatalog]] surface, mirroring OPTIMIZE/VACUUM/RESTORE
  * and the DESCRIBE audit commands.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog with StagingTableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark: SparkSession = SparkSession.active

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      s"${sys.props("java.io.tmpdir")}/graft-warehouse")
  }

  override def name(): String = catalogName

  /** `GENERATED ALWAYS AS IDENTITY` columns: the analyzer gates the
    * CREATE on this capability; value allocation is the table's job
    * ([[graft.etl.DeltaLite]] appends allocate from a commit-logged
    * high-water mark, atomic with the data commit).
    */
  override def capabilities(): util.Set[TableCatalogCapability] =
    util.EnumSet.of(
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS,
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  private def fs = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def nsPath(ns: Array[String]): Path =
    new Path((warehouse +: ns).mkString("/"))

  private def tablePath(ident: Identifier): Path =
    new Path((warehouse +: ident.namespace() :+ ident.name()).mkString("/"))

  private def isTableDir(p: Path): Boolean =
    fs.exists(new Path(p, "_log"))

  /** External-table pointer: `CREATE TABLE … LOCATION '/path'` keeps
    * the DATA at the caller's path and plants a one-line `_external`
    * file at the warehouse slot — the catalog stays storage-derived
    * (no metastore), the pointer IS the registration. DROP on an
    * external table removes only the pointer (Delta's external-table
    * contract: unregister, never delete the caller's data).
    */
  private def externalPointer(ident: Identifier): Path =
    new Path(tablePath(ident), "_external")

  private def externalRoot(ident: Identifier): Option[String] = {
    val ptr = externalPointer(ident)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
  }

  /** Delta's `delta.`/path`` addressing: a backquoted absolute path in
    * table position (`SELECT … FROM graft.`/tmp/t``) bypasses the
    * warehouse — the path IS the table. Unmanaged by design: CREATE/
    * DROP/RENAME refuse (there is no registration to add or remove),
    * everything else (reads, time travel, DML, maintenance CALLs)
    * works exactly like a named table.
    */
  private def pathIdent(ident: Identifier): Option[String] =
    if (ident.namespace().isEmpty && ident.name().startsWith("/"))
      Some(ident.name()) else None

  private def rejectPath(ident: Identifier, verb: String): Unit =
    if (pathIdent(ident).isDefined) throw new UnsupportedOperationException(
      s"$verb on path-addressed table ${ident.name()}: path tables are " +
        "unmanaged (the path is the table) — write data to create one, " +
        "delete the directory to drop it, or use a named catalog table")

  /** The table's effective DeltaLite root (external pointer wins). */
  private def tableRoot(ident: Identifier): String =
    pathIdent(ident).getOrElse(
      externalRoot(ident).getOrElse(tablePath(ident).toString))

  override def tableExists(ident: Identifier): Boolean =
    pathIdent(ident) match {
      case Some(p) => fs.exists(new Path(p, "_log"))
      case None => externalRoot(ident) match {
        case Some(root) => fs.exists(new Path(root, "_log"))
        case None => isTableDir(tablePath(ident))
      }
    }

  // ----- namespaces ------------------------------------------------

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root).filter(_.isDirectory)
      .map(st => Array(st.getPath.getName))
  }

  override def listNamespaces(ns: Array[String]): Array[Array[String]] = {
    if (ns.isEmpty) return listNamespaces()
    if (!fs.exists(nsPath(ns))) throw new NoSuchNamespaceException(ns)
    Array.empty // single-level namespaces
  }

  override def namespaceExists(ns: Array[String]): Boolean =
    ns.length == 1 && fs.exists(nsPath(ns)) && !isTableDir(nsPath(ns))

  override def loadNamespaceMetadata(
      ns: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    Map("location" -> nsPath(ns).toString).asJava
  }

  override def createNamespace(ns: Array[String],
      metadata: util.Map[String, String]): Unit = {
    require(ns.length == 1, s"graft namespaces are single-level: ${ns.mkString(".")}")
    fs.mkdirs(nsPath(ns))
  }

  override def alterNamespace(ns: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE not supported")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    val p = nsPath(ns)
    if (!fs.exists(p)) return false
    if (!cascade && fs.listStatus(p).nonEmpty)
      throw new IllegalStateException(s"namespace ${ns.mkString(".")} is not empty")
    fs.delete(p, true)
  }

  // ----- tables ----------------------------------------------------

  override def listTables(ns: Array[String]): Array[Identifier] = {
    val p = nsPath(ns)
    if (!fs.exists(p)) throw new NoSuchNamespaceException(ns)
    // every listed name must loadTable: an _external pointer whose
    // target lost its _log would SHOW here yet throw on load —
    // resolve through tableExists instead of the raw pointer file
    fs.listStatus(p).filter(_.isDirectory)
      .map(st => Identifier.of(ns, st.getPath.getName))
      .filter(tableExists)
  }

  /** Open the DeltaLite handle; partition spec and stats key are read
    * back from the commit log, so catalog reads skip on the table's
    * recorded stats without being told the key.
    */
  private def open(ident: Identifier): DeltaLite = {
    val root = tableRoot(ident)
    val probe = new DeltaLite(spark, root)
    probe.recordedStatsKey match {
      case sk @ Some(_) => new DeltaLite(spark, root, statsKey = sk)
      case None => probe
    }
  }

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new GraftTable(fullName(ident), open(ident))
  }

  /** VERSION AS OF n. */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new GraftTable(fullName(ident), open(ident),
      asOfVersion = Some(version.toInt))
  }

  /** TIMESTAMP AS OF ts (micros since epoch). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new GraftTable(fullName(ident), open(ident),
      asOfTimestampMicros = Some(timestampMicros))
  }

  private def fullName(ident: Identifier): String =
    (catalogName +: ident.namespace() :+ ident.name()).mkString(".")

  /** V2 Column[] → StructType, KEEPING what Spark's own conversion
    * drops: an `identityColumnSpec` becomes the `identity.*` metadata
    * keys the table allocates from (the StructType path is the single
    * source of truth — the commit log records schemaJson). Generation
    * expressions and column defaults are rejected loudly rather than
    * silently discarded.
    */
  private def columnsToSchema(
      columns: Array[org.apache.spark.sql.connector.catalog.Column]): StructType = {
    val sch = StructType(columns.toIndexedSeq.map { c =>
      val mb = new MetadataBuilder()
      Option(c.metadataInJSON()).foreach(j =>
        mb.withMetadata(Metadata.fromJson(j)))
      Option(c.comment()).foreach(mb.putString("comment", _))
      Option(c.identityColumnSpec()).foreach { s =>
        mb.putLong("identity.start", s.getStart)
        mb.putLong("identity.step", s.getStep)
        mb.putBoolean("identity.allowExplicitInsert", s.isAllowExplicitInsert)
      }
      Option(c.generationExpression()).foreach(
        mb.putString(graft.etl.DeltaLite.GenerationExpressionKey, _))
      // column DEFAULTs ride Spark's canonical metadata keys: the
      // ANALYZER fills them at INSERT (ResolveDefaultColumns reads the
      // table schema), the connector only has to not lose them.
      // CURRENT_DEFAULT = the declared sql; EXISTS_DEFAULT = the
      // folded literal (what a pre-existing row would read — for
      // graft, like Delta, old rows read null; the key still must
      // round-trip for DESCRIBE)
      Option(c.defaultValue()).foreach { d =>
        val sql = Option(d.getSql).getOrElse(
          org.apache.spark.sql.catalyst.expressions.Literal(
            d.getValue.value(), d.getValue.dataType()).sql)
        mb.putString("CURRENT_DEFAULT", sql)
        mb.putString("EXISTS_DEFAULT",
          org.apache.spark.sql.catalyst.expressions.Literal(
            d.getValue.value(), d.getValue.dataType()).sql)
      }
      StructField(c.name, c.dataType, c.nullable, mb.build())
    })
    validateGenerated(sch)
    sch
  }

  /** Generated columns may reference only NON-generated, non-identity
    * sibling columns (no chains — write-side recomputation is a
    * single pass) and must parse without subqueries.
    */
  private def validateGenerated(sch: StructType): Unit = {
    val key = graft.etl.DeltaLite.GenerationExpressionKey
    val genNames = sch.fields.filter(_.metadata.contains(key)).map(_.name).toSet
    sch.fields.filter(_.metadata.contains(key)).foreach { f =>
      val exprSql = f.metadata.getString(key)
      val parsed = spark.sessionState.sqlParser.parseExpression(exprSql)
      require(!parsed.containsPattern(
        org.apache.spark.sql.catalyst.trees.TreePattern.PLAN_EXPRESSION),
        s"generated column '${f.name}': subqueries are not allowed")
      val refs = parsed.collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.name
      }.toSet
      refs.foreach { r =>
        require(sch.fieldNames.contains(r),
          s"generated column '${f.name}' references unknown column '$r'")
        require(!genNames.contains(r),
          s"generated column '${f.name}' may not reference another " +
            s"generated column ('$r')")
      }
    }
  }

  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    createTable(ident, columnsToSchema(columns), partitions, properties)

  override def stageCreate(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    stageCreate(ident, columnsToSchema(columns), partitions, properties)

  override def stageReplace(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    stageReplace(ident, columnsToSchema(columns), partitions, properties)

  override def stageCreateOrReplace(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    stageCreateOrReplace(ident, columnsToSchema(columns), partitions,
      properties)

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    rejectPath(ident, "CREATE TABLE")
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val (clusterCols, partTransforms) = splitClustering(partitions)
    val parts = identityParts(partTransforms)
    val userProps = userProperties(properties) ++
      (if (clusterCols.nonEmpty)
        Map("clusteringColumns" -> clusterCols.mkString(",")) else Map.empty)
    val statsKey = Option(properties.get("statskey"))
    val external = Option(properties.get("location")).map(_.trim).filter(_.nonEmpty)
    val root = external.getOrElse(tablePath(ident).toString)
    val t = new DeltaLite(spark, root,
      statsKey = statsKey, partitionBy = parts)
    external match {
      case Some(loc) =>
        // plant the pointer FIRST so a concurrent loadTable resolves
        val tmp = new Path(tablePath(ident),
          s"._external-${java.util.UUID.randomUUID().toString.take(8)}")
        fs.mkdirs(tablePath(ident))
        val out = fs.create(tmp, true)
        try out.write(loc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        require(fs.rename(tmp, externalPointer(ident)),
          s"failed to register external table at $loc")
        if (t.latestVersion.isEmpty)
          // fresh external location: v0 records the declared schema
          t.append(spark.createDataFrame(new util.ArrayList[Row](), schema))
        else if (schema.nonEmpty)
          // registering an EXISTING table: a declared schema must match
          require(t.schema.exists(existing =>
            existing.fields.map(f => (f.name, f.dataType)).toSeq ==
              schema.fields.map(f => (f.name, f.dataType)).toSeq),
            s"declared schema differs from the existing table at $loc")
      case None =>
        // v0 records the schema (and partition spec), zero data files
        t.append(spark.createDataFrame(new util.ArrayList[Row](), schema))
    }
    // TBLPROPERTIES declared AT CREATE persist like SET TBLPROPERTIES
    // would (one property commit after the schema commit) — including
    // CLUSTER BY's clusteringColumns, which OPTIMIZE then picks up
    if (userProps.nonEmpty) t.setTableProperties(userProps)
    new GraftTable(fullName(ident), t)
  }

  /** `CLUSTER BY (a, b)` arrives as a ClusterByTransform among the
    * partitioning transforms — split it out (clustering is a LAYOUT
    * HINT stored as the `clusteringColumns` property and applied by
    * OPTIMIZE's z-order, never a partition spec).
    */
  private def splitClustering(partitions: Array[Transform])
      : (Seq[String], Array[Transform]) = {
    import org.apache.spark.sql.connector.expressions.ClusterByTransform
    val (c, rest) = partitions.partition(_.isInstanceOf[ClusterByTransform])
    val cols = c.toSeq.flatMap { case ClusterByTransform(refs) =>
      refs.map(_.fieldNames().mkString("."))
    }
    (cols, rest)
  }

  /** The properties the USER declared, minus the engine-reserved keys
    * Spark or this catalog injects at CREATE.
    */
  private def userProperties(
      properties: util.Map[String, String]): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    properties.asScala.toMap.filterNot { case (k, _) =>
      GraftCatalog.ReservedCreateKeys.contains(k) || k.startsWith("option.")
    }
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val t = open(ident)
    if (t.latestVersion.isEmpty) throw new NoSuchTableException(ident)
    changes.foreach {
      case rc: TableChange.RenameColumn =>
        require(rc.fieldNames().length == 1, "nested columns unsupported")
        t.renameColumn(rc.fieldNames()(0), rc.newName())
      case dc: TableChange.DeleteColumn =>
        require(dc.fieldNames().length == 1, "nested columns unsupported")
        t.dropColumn(dc.fieldNames()(0))
      case ac: TableChange.AddColumn =>
        require(ac.fieldNames().length == 1, "nested columns unsupported")
        require(ac.position() == null,
          "FIRST/AFTER positions unsupported — columns append at the end")
        // existing rows have no value for the new column, so a NOT
        // NULL add can only produce violations — reject rather than
        // silently record the column as nullable
        require(ac.isNullable,
          "ADD COLUMN ... NOT NULL is unsupported: existing rows " +
            "would violate it; add nullable, backfill, then constrain")
        t.addColumn(ac.fieldNames()(0), ac.dataType())
      case uc: TableChange.UpdateColumnType =>
        require(uc.fieldNames().length == 1, "nested columns unsupported")
        t.widenColumn(uc.fieldNames()(0), uc.newDataType())
      case sp: TableChange.SetProperty =>
        t.setTableProperties(Map(sp.property() -> sp.value()))
      case rp: TableChange.RemoveProperty =>
        t.unsetTableProperties(Seq(rp.property()))
      case ac: TableChange.AddConstraint =>
        // ALTER TABLE t ADD CONSTRAINT name CHECK (sql): only CHECK
        // constraints are enforceable table facts here — PK/FK/UNIQUE
        // are informational in Delta too, and recording a contract we
        // don't enforce would be a silent lie
        ac.constraint() match {
          case chk: org.apache.spark.sql.connector.catalog.constraints.Check =>
            t.addCheckConstraint(chk.name(), chk.predicateSql())
          case other => throw new UnsupportedOperationException(
            s"only CHECK constraints are supported: ${other.toDDL}")
        }
      case dcst: TableChange.DropConstraint =>
        if (!(dcst.ifExists() && !t.checkConstraints.contains(dcst.name())))
          t.dropCheckConstraint(dcst.name())
      case c => throw new UnsupportedOperationException(
        s"unsupported table change: $c")
    }
    new GraftTable(fullName(ident), open(ident))
  }

  override def dropTable(ident: Identifier): Boolean = {
    rejectPath(ident, "DROP TABLE")
    if (externalRoot(ident).isDefined)
      // external: unregister only — the caller's data stays
      return fs.delete(tablePath(ident), true)
    val p = tablePath(ident)
    if (!isTableDir(p)) return false
    fs.delete(p, true)
  }

  // ----- CREATE OR REPLACE TABLE (StagingTableCatalog) -------------
  // REPLACE is ONE atomic `overwrite` commit in the EXISTING log: a
  // concurrent reader sees the old snapshot until the commit record
  // publishes, never an empty or half-built table, and time travel
  // below the replace keeps working (Delta's REPLACE contract).
  // Retained across a replace (documented divergence from a
  // drop-and-recreate): version history, table properties and CHECK
  // constraints. The partition layout is fixed by the commit log, so
  // a REPLACE that declares a DIFFERENT layout is rejected loudly
  // (DROP + CREATE changes layouts).

  private def identityParts(partitions: Array[Transform]): Seq[String] =
    partitions.toSeq.map { t =>
      if (t.name() != "identity" || t.references().length != 1)
        throw new UnsupportedOperationException(
          s"graft tables support identity partitioning only, got $t")
      t.references()(0).fieldNames().mkString(".")
    }

  private def stage(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String],
      replacing: Boolean): StagedTable = {
    if (Option(properties.get("location")).exists(_.trim.nonEmpty))
      throw new UnsupportedOperationException(
        "CREATE OR REPLACE with LOCATION is not supported; " +
          "use CREATE TABLE ... LOCATION")
    val (clusterCols, partTransforms) = splitClustering(partitions)
    val parts = identityParts(partTransforms)
    val userProps = userProperties(properties) ++
      (if (clusterCols.nonEmpty)
        Map("clusteringColumns" -> clusterCols.mkString(",")) else Map.empty)
    val root = tableRoot(ident)
    if (replacing) {
      val existing = DeltaLite(spark, root)
      val existingParts = existing.partitionColumns
      if (existingParts != parts)
        throw new UnsupportedOperationException(
          s"REPLACE cannot change the partition layout of ${fullName(ident)} " +
            s"(existing: ${existingParts.mkString(",")}; declared: " +
            s"${parts.mkString(",")}); DROP and re-CREATE to change layouts")
    }
    new GraftStagedTable(fullName(ident), root, schema, parts,
      Option(properties.get("statskey")), spark, replacing, userProps)
  }

  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    stage(ident, schema, partitions, properties, replacing = false)
  }

  override def stageReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    stage(ident, schema, partitions, properties, replacing = true)
  }

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    stage(ident, schema, partitions, properties,
      replacing = tableExists(ident))

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    rejectPath(oldIdent, "RENAME TABLE"); rejectPath(newIdent, "RENAME TABLE")
    if (!tableExists(oldIdent))
      throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent))
      throw new TableAlreadyExistsException(newIdent)
    if (!fs.exists(nsPath(newIdent.namespace())))
      throw new NoSuchNamespaceException(newIdent.namespace())
    require(fs.rename(tablePath(oldIdent), tablePath(newIdent)),
      s"rename failed: $oldIdent -> $newIdent")
  }

  // ----- procedures (the OPTIMIZE/VACUUM/RESTORE DDL surface) -------

  override def listProcedures(ns: Array[String]): Array[Identifier] =
    GraftCatalog.ProcedureNames.map(n => Identifier.of(ns, n)).toArray

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    val pname = ident.name().toLowerCase(java.util.Locale.ROOT)
    require(GraftCatalog.ProcedureNames.contains(pname),
      s"unknown procedure $pname; available: " +
        GraftCatalog.ProcedureNames.mkString(", "))
    new GraftProcedure(pname, this)
  }

  /** `db.table` (relative to this catalog) → DeltaLite handle. */
  private[catalog] def openByName(qualified: String): DeltaLite = {
    if (qualified.startsWith("/")) {
      // path-addressed CALL arg (graft.`/path` in the maintenance SQL)
      require(fs.exists(new Path(qualified, "_log")),
        s"no DeltaLite table at $qualified")
      val probe = new DeltaLite(spark, qualified)
      return probe.recordedStatsKey match {
        case sk @ Some(_) => new DeltaLite(spark, qualified, statsKey = sk)
        case None => probe
      }
    }
    val segs = qualified.split('.')
    val ident = Identifier.of(segs.init, segs.last)
    if (!isTableDir(tablePath(ident)))
      throw new NoSuchTableException(ident)
    open(ident)
  }

  /** Warehouse root a `db.table` name maps to — where a clone target
    * lands so the new table is immediately catalog-addressable. The
    * namespace must exist; the table must not.
    */
  private[catalog] def rootFor(qualified: String): String = {
    val segs = qualified.split('.')
    val ident = Identifier.of(segs.init, segs.last)
    require(namespaceExists(ident.namespace()),
      s"no such namespace ${ident.namespace().mkString(".")}")
    require(!tableExists(ident),
      s"clone target $qualified already exists")
    tablePath(ident).toString
  }
}

object GraftCatalog {
  /** Keys Spark/this catalog injects into CREATE TABLE properties —
    * never user TBLPROPERTIES.
    */
  val ReservedCreateKeys: Set[String] = Set("location", "provider",
    "owner", "comment", "external", "statskey", "is_managed_location")

  val ProcedureNames: Seq[String] = Seq("optimize", "vacuum", "restore",
    "zorder", "zorder_by", "analyze", "checkpoint", "clean_log", "add_constraint",
    "drop_constraint", "history", "detail", "copy_into", "table_changes",
    "optimize_where", "vacuum_orphans", "clone", "vacuum_dry_run", "fsck",
    "convert", "convert_from_delta", "export_to_delta", "row_count")

  /** Register the catalog + extensions-equivalent state on a live
    * session (catalog lookup is lazy per name, so runtime conf works).
    * The read-substitution rule itself must come from
    * `spark.sql.extensions=graft.GraftExtensions` at session build —
    * same two-conf contract as the Delta connector.
    */
  def install(spark: SparkSession, warehouse: String): Unit = {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", warehouse)
  }
}

/** One CALL-able maintenance procedure over a named DeltaLite table.
  * All parameters are strings (ints parse) so the CALL surface stays
  * uniform: `CALL graft.system.optimize('gold.events')`.
  */
class GraftProcedure(pname: String, catalog: GraftCatalog)
    extends UnboundProcedure with BoundProcedure {

  override def name(): String = pname
  override def description(): String = s"graft maintenance procedure $pname"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  private val extraParams: Seq[String] = pname match {
    case "vacuum" => Seq("retain_versions")
    case "vacuum_dry_run" => Seq("retain_versions")
    case "fsck" => Seq("dry_run")
    case "restore" => Seq("version")
    case "zorder" => Seq("col_a", "col_b", "num_files")
    case "zorder_by" => Seq("cols", "num_files")
    case "analyze" => Seq("columns")
    case "add_constraint" => Seq("name", "sql")
    case "drop_constraint" => Seq("name")
    case "copy_into" => Seq("source_dir")
    case "table_changes" => Seq("from_version", "to_version", "max_rows")
    case "optimize_where" => Seq("predicate")
    case "clone" => Seq("target", "mode")
    case _ => Nil
  }

  override def parameters(): Array[ProcedureParameter] = {
    // convert/convert_from_delta address PATHS (no table yet)
    val names =
      if (pname == "convert") Seq("source_dir")
      else if (pname == "convert_from_delta")
        Seq("source_dir", "target_dir")
      else "table" +: extraParams
    names.map(p => ProcedureParameter.in(p, StringType).build()).toArray
  }

  private def stringScan(header: String, values: Seq[String]): Scan =
    new LocalScan {
      override def readSchema(): StructType =
        StructType(Seq(StructField(header, StringType, nullable = false)))
      override def rows(): Array[InternalRow] = values.map(v =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(v)))
          : InternalRow).toArray
    }

  override def call(input: InternalRow): util.Iterator[Scan] = {
    val args = (0 until input.numFields).map(i =>
      input.getUTF8String(i).toString)
    if (pname == "convert_from_delta") {
      // zero-copy adoption of a REAL Delta table to a SIDE root
      // (in-place refuses — vacuum would reclaim the source's files);
      // address the result as an external LOCATION table afterwards
      val t = graft.etl.DeltaLite.convertFromDelta(
        SparkSession.active, args(0), args(1))
      return util.Arrays.asList(stringScan("result",
        Seq(s"adopted ${t.detail().head.getAs[Long]("num_live_files")} " +
          s"files from ${args(0)} at ${args(1)}"))).iterator()
    }
    if (pname == "convert") {
      // CONVERT TO DELTA parquet.`dir`: in-place — the commit log
      // lands INSIDE the directory (zero data movement, files adopted
      // by reference); address it afterwards as an external LOCATION
      // table or through the DeltaLite path API
      val t = graft.etl.DeltaLite.convert(
        SparkSession.active, args.head, args.head)
      return util.Arrays.asList(stringScan("result",
        Seq(s"converted ${t.detail().head.getAs[Long]("num_live_files")} " +
          s"files at ${args.head}"))).iterator()
    }
    val t = catalog.openByName(args.head)
    // retain arg: plain int = versions; "h:n" = RETAIN n HOURS mapped
    // to the versions committed inside the window
    def retain(a: String): Int =
      if (a.startsWith("h:")) t.retainVersionsForHours(a.drop(2).toDouble)
      else a.toInt
    if (pname == "vacuum_dry_run")
      return util.Arrays.asList(
        stringScan("path", t.vacuumCandidates(retain(args(1))))).iterator()
    if (pname == "fsck") {
      val dry = args(1).equalsIgnoreCase("true")
      val missing = t.fsck(dry)
      return util.Arrays.asList(stringScan("path", missing)).iterator()
    }
    // row-set procedures: DESCRIBE HISTORY / DESCRIBE DETAIL as CALLs
    // (the reference's table-audit surface) — the DataFrame's own rows
    // come back as the CALL's result set; both are bounded metadata
    // (O(versions) / one row), never a data scan
    if (pname == "history" || pname == "detail" || pname == "table_changes") {
      val df =
        if (pname == "history") t.history()
        else if (pname == "detail") t.detail()
        else {
          // row-level CDC slice as a CALL result set — an AUDIT
          // surface, so the row count is capped explicitly (the
          // scale path is the readChangeFeed streaming source /
          // changesBetween DataFrame, never a driver collect)
          val capped = t.changesBetween(args(1).toInt, args(2).toInt)
            .limit(args(3).toInt)
          capped
        }
      val schemaOut = df.schema
      val collected = df.queryExecution.executedPlan.executeCollect()
      val scan: Scan = new LocalScan {
        override def readSchema(): StructType = schemaOut
        override def rows(): Array[InternalRow] = collected
      }
      return util.Arrays.asList(scan).iterator()
    }
    val result: String = pname match {
      case "optimize" =>
        // a CLUSTER BY table's plain OPTIMIZE re-clusters on its
        // declared columns (the liquid-clustering UX) — INCREMENTALLY:
        // only post-clustering appends + boundary-overlapping files
        // rewrite (full rewrite stays reachable via CALL zorder/
        // zorder_by); otherwise compaction only
        t.tableProperties.get("clusteringColumns")
          .map(_.split(',').map(_.trim).toSeq).filter(_.nonEmpty) match {
          case Some(cols) =>
            // target file size: 128 MB cap (the scale default), but
            // never fewer than ~32 output files while the table is
            // small — clustering must pay off as file pruning from the
            // first demo-sized OPTIMIZE, and at 100 TB the cap wins.
            // totalLiveBytes answers from the entries DF (no O(live)
            // driver fold on a checkpointed million-file table); zero
            // (pre-size-log entries carry no recorded bytes) means
            // no sizing information — take the scale default rather
            // than a degenerate 1-byte target
            val total = t.totalLiveBytes()
            val target =
              if (total <= 0) 128L * 1024 * 1024
              else math.min(128L * 1024 * 1024, math.max(1L, total / 32))
            t.optimizeClustered(cols, targetBytes = target) match {
              case Some((v, n)) => s"clustered $n files at v$v"
              case None => "noop (layout already clustered)"
            }
          case None =>
            t.compact().map(v => s"compacted at v$v").getOrElse("noop")
        }
      case "vacuum" =>
        s"removed ${t.vacuum(retain(args(1))).size} files"
      case "restore" =>
        // "ts:<timestamp>" = RESTORE … TO TIMESTAMP AS OF; plain int =
        // VERSION AS OF
        val v =
          if (args(1).startsWith("ts:"))
            t.restoreToTime(java.sql.Timestamp.valueOf(args(1).drop(3)))
          else t.restore(args(1).toInt)
        s"restored at v$v"
      case "zorder" =>
        s"clustered at v${t.optimizeZOrder(args(1), args(2), args(3).toInt)}"
      case "zorder_by" =>
        s"clustered at v${t.optimizeZOrderN(
          args(1).split(',').map(_.trim).toSeq, args(2).toInt)}"
      case "analyze" => args(1) match {
        // ANALYZE … NOSCAN computes size-only stats; the commit log
        // already records every file's byte size, so there is nothing
        // to scan — truthful noop
        case "__noscan__" => "noop (file sizes already in the commit log)"
        // ANALYZE [FOR ALL COLUMNS]: every orderable atomic column
        // joins the skipping index
        case "*" =>
          val cols = t.schema.map(_.fields.toSeq).getOrElse(Nil)
            .filter(_.dataType match {
              case _: NumericType | StringType | DateType |
                   TimestampType | BooleanType => true
              case _ => false
            }).map(_.name)
          require(cols.nonEmpty, "no atomic columns to analyze")
          t.restats(cols).map(v => s"analyzed at v$v").getOrElse("noop")
        case colList =>
          t.restats(colList.split(',').map(_.trim).toSeq)
            .map(v => s"analyzed at v$v").getOrElse("noop")
      }
      case "checkpoint" =>
        t.checkpointNow().map(v => s"checkpointed v$v").getOrElse("noop")
      case "clean_log" => s"trimmed ${t.cleanLog().size} records"
      case "add_constraint" =>
        s"added at v${t.addCheckConstraint(args(1), args(2))}"
      case "drop_constraint" =>
        s"dropped at v${t.dropCheckConstraint(args(1))}"
      case "copy_into" =>
        t.copyInto(args(1)).map(v => s"ingested at v$v").getOrElse("noop")
      case "export_to_delta" =>
        s"exported Delta version ${t.exportToDelta()} " +
          s"under ${t.root}/_delta_log"
      case "optimize_where" =>
        // partition-scoped OPTIMIZE: the predicate string parses with
        // Spark's own expression parser (same dialect as any WHERE)
        t.compactWhere(org.apache.spark.sql.functions.expr(args(1)))
          .map(v => s"compacted at v$v").getOrElse("noop")
      case "vacuum_orphans" =>
        s"removed ${t.vacuumOrphans().size} orphan dirs"
      case "row_count" =>
        // COUNT(*) from metadata alone (the recorded per-file counts)
        // — honest "unknown" when any live file predates recording or
        // deletion vectors mask rows, never a wrong number
        t.rowCount().map(n => s"$n rows (from metadata)").getOrElse(
          "unknown (some live files lack recorded counts or deletion " +
            "vectors mask rows — ANALYZE or OPTIMIZE records them)")
      case "clone" =>
        // target is db.table in THIS catalog: the clone lands as a
        // new named table at the warehouse layout
        val targetRoot = catalog.rootFor(args(1))
        args(2) match {
          case "shallow" => t.shallowCloneTo(targetRoot)
          case "deep" => t.deepCloneTo(targetRoot)
          case other => sys.error(s"clone mode must be shallow|deep, got $other")
        }
        s"cloned ${args(2)} to ${args(1)}"
    }
    val scan: Scan = new LocalScan {
      override def readSchema(): StructType =
        StructType(Seq(StructField("result", StringType, nullable = false)))
      override def rows(): Array[InternalRow] = Array(
        new GenericInternalRow(Array[Any](UTF8String.fromString(result))))
    }
    util.Arrays.asList(scan).iterator()
  }
}
