package graft

import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.types.{DataType, StructType}

/** Delta-verbatim maintenance SQL: a migrating Delta user's
  * maintenance cells run unchanged — each statement translates to the
  * equivalent `CALL graft.system.*` procedure and re-parses through
  * the delegate (no hand-built plans, the CALL grammar is Spark's).
  *
  *   - `OPTIMIZE t` / `OPTIMIZE t WHERE p` / `OPTIMIZE t ZORDER BY (a, b)`
  *   - `VACUUM t` / `VACUUM t RETAIN n VERSIONS` /
  *     `VACUUM t RETAIN n HOURS` — graft retention is natively
  *     version-based; HOURS maps onto it by keeping every version
  *     whose commit record published inside the window plus the
  *     current one (the same commit-time clock `TIMESTAMP AS OF`
  *     reads — MaintenanceSqlSpec pins the mapping)
  *   - `DESCRIBE HISTORY t` / `DESC HISTORY t` / `DESCRIBE DETAIL t`
  *   - `RESTORE [TABLE] t [TO] VERSION AS OF n`
  *   - `CREATE TABLE t2 SHALLOW|DEEP CLONE t1`
  *   - `VACUUM t [RETAIN n VERSIONS] DRY RUN` (row-set: the paths a
  *     real vacuum would delete, deleting nothing)
  *   - `FSCK REPAIR TABLE t [DRY RUN]` (drop refs to data files
  *     deleted out-of-band)
  *   - `ANALYZE TABLE graft.db.t COMPUTE STATISTICS [NOSCAN |
  *     FOR COLUMNS a, b | FOR ALL COLUMNS]` — EXPLICIT graft.-prefixed
  *     names only: ANALYZE is valid vanilla Spark SQL, a 1/2-part name
  *     may address the session catalog and must keep working there
  *   - `CONVERT TO DELTA parquet.`dir`` (also `CONVERT TO GRAFT …`):
  *     in-place adoption, the log lands inside the directory;
  *     PARTITIONED BY rejected loudly (hive dirs lack the partition
  *     columns' bytes)
  *
  * Table names resolve against the graft catalog: `graft.db.t` or
  * `db.t` (the leading catalog name is dropped — the procedures
  * address tables catalog-relative). Anything that doesn't match a
  * maintenance shape delegates verbatim, so the full Spark dialect is
  * untouched.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(
      GraftSqlParser.rewriteMaintenance(sqlText).getOrElse(sqlText))

  override def parseExpression(sqlText: String) =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  // one identifier part: bare word or backquoted
  private val Part = "(?:`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)"
  private val Ident = s"($Part(?:\\.$Part)*)"

  private val OptimizeZorder =
    s"(?is)\\s*OPTIMIZE\\s+$Ident\\s+ZORDER\\s+BY\\s*\\(?\\s*($Part(?:\\s*,\\s*$Part)*)\\s*\\)?\\s*;?\\s*".r
  private val OptimizeWhere =
    s"(?is)\\s*OPTIMIZE\\s+$Ident\\s+WHERE\\s+(.+?)\\s*;?\\s*".r
  private val Optimize =
    s"(?is)\\s*OPTIMIZE\\s+$Ident\\s*;?\\s*".r
  private val VacuumRetain =
    s"(?is)\\s*VACUUM\\s+$Ident\\s+RETAIN\\s+(\\d+)\\s+(VERSIONS|HOURS)\\s*;?\\s*".r
  private val Vacuum =
    s"(?is)\\s*VACUUM\\s+$Ident\\s*;?\\s*".r
  private val DescHistory =
    s"(?is)\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$Ident\\s*;?\\s*".r
  private val DescDetail =
    s"(?is)\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$Ident\\s*;?\\s*".r
  private val Restore =
    s"(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$Ident\\s+(?:TO\\s+)?VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*".r
  private val RestoreTs =
    s"(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$Ident\\s+(?:TO\\s+)?TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*".r
  private val Clone =
    s"(?is)\\s*CREATE\\s+TABLE\\s+$Ident\\s+(SHALLOW|DEEP)\\s+CLONE\\s+$Ident\\s*;?\\s*".r
  private val VacuumDryRun =
    s"(?is)\\s*VACUUM\\s+$Ident(?:\\s+RETAIN\\s+(\\d+)\\s+(VERSIONS|HOURS))?\\s+DRY\\s+RUN\\s*;?\\s*".r
  private val Fsck =
    s"(?is)\\s*FSCK\\s+REPAIR\\s+TABLE\\s+$Ident(\\s+DRY\\s+RUN)?\\s*;?\\s*".r
  private val AnalyzeNoscan =
    s"(?is)\\s*ANALYZE\\s+TABLE\\s+$Ident\\s+COMPUTE\\s+STATISTICS\\s+NOSCAN\\s*;?\\s*".r
  private val AnalyzeCols =
    s"(?is)\\s*ANALYZE\\s+TABLE\\s+$Ident\\s+COMPUTE\\s+STATISTICS\\s+FOR\\s+COLUMNS\\s+($Part(?:\\s*,\\s*$Part)*)\\s*;?\\s*".r
  private val AnalyzeAll =
    s"(?is)\\s*ANALYZE\\s+TABLE\\s+$Ident\\s+COMPUTE\\s+STATISTICS(?:\\s+FOR\\s+ALL\\s+COLUMNS)?\\s*;?\\s*".r
  private val ConvertDelta =
    s"(?is)\\s*CONVERT\\s+TO\\s+(?:DELTA|GRAFT)\\s+parquet\\s*\\.\\s*`([^`]+)`(\\s+NO\\s+STATISTICS)?\\s*;?\\s*".r
  private val ConvertPartitioned =
    s"(?is)\\s*CONVERT\\s+TO\\s+(?:DELTA|GRAFT)\\s+.*PARTITIONED\\s+BY.*".r

  /** graft-catalog-relative 'db.t' from the statement's identifier;
    * None when the name addresses another catalog (delegate verbatim —
    * Spark will produce its own resolution error).
    */
  // Delta's `delta.`/path`` addressing: the maintenance verbs accept
  // `graft.`/abs/path`` (or a bare backquoted path) — openByName
  // routes a leading '/' to the path directly
  private val PathRef = "(?:graft\\.)?`(/[^`]*)`".r

  private def tableArg(raw: String): Option[String] = raw match {
    case PathRef(p) => Some(p)
    case _ =>
      val parts = raw.split('.').toSeq.map(_.stripPrefix("`").stripSuffix("`"))
      parts match {
        case Seq(db, t) => Some(s"$db.$t")
        case Seq("graft", db, t) => Some(s"$db.$t")
        case Seq(_, _, _) => None // another catalog's table
        case _ => None // single-part: no current-namespace context here
      }
  }

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Strict variant for verbs that are VALID vanilla Spark SQL
    * (ANALYZE TABLE): only an EXPLICIT `graft.db.t` name rewrites —
    * a 1/2-part name may address the session catalog, where Spark's
    * own ANALYZE must keep working.
    */
  private val GraftPathRef = "graft\\.`(/[^`]*)`".r

  private def graftTableArg(raw: String): Option[String] = raw match {
    // an explicit graft.`/path` is unambiguous (never session-catalog)
    case GraftPathRef(p) => Some(p)
    case _ =>
      val parts = raw.split('.').toSeq.map(_.stripPrefix("`").stripSuffix("`"))
      parts match {
        case Seq("graft", db, t) => Some(s"$db.$t")
        case _ => None
      }
  }

  /** The CALL translation, or None to delegate the text verbatim. */
  private[graft] def rewriteMaintenance(sql: String): Option[String] =
    sql match {
      case OptimizeZorder(t, colList) => tableArg(t).map { n =>
        val cols = colList.split(',').toSeq
          .map(_.trim.stripPrefix("`").stripSuffix("`"))
        if (cols.size == 2)
          s"CALL graft.system.zorder(${q(n)}, ${q(cols.head)}, " +
            s"${q(cols(1))}, '32')"
        else
          s"CALL graft.system.zorder_by(${q(n)}, ${q(cols.mkString(","))}, '32')"
      }
      case OptimizeWhere(t, pred) => tableArg(t).map(n =>
        s"CALL graft.system.optimize_where(${q(n)}, ${q(pred)})")
      case Optimize(t) => tableArg(t).map(n =>
        s"CALL graft.system.optimize(${q(n)})")
      case VacuumDryRun(t, n, unit) => tableArg(t).map { tn =>
        val retain =
          if (n != null && unit.equalsIgnoreCase("HOURS")) s"h:$n"
          else Option(n).getOrElse("1")
        s"CALL graft.system.vacuum_dry_run(${q(tn)}, ${q(retain)})"
      }
      case Fsck(t, dry) => tableArg(t).map(tn =>
        s"CALL graft.system.fsck(${q(tn)}, " +
          s"${q(String.valueOf(dry != null))})")
      case AnalyzeNoscan(t) => graftTableArg(t).map(tn =>
        s"CALL graft.system.analyze(${q(tn)}, '__noscan__')")
      case AnalyzeCols(t, colList) => graftTableArg(t).map { tn =>
        val cols = colList.split(',').toSeq
          .map(_.trim.stripPrefix("`").stripSuffix("`"))
        s"CALL graft.system.analyze(${q(tn)}, ${q(cols.mkString(","))})"
      }
      case AnalyzeAll(t) => graftTableArg(t).map(tn =>
        s"CALL graft.system.analyze(${q(tn)}, '*')")
      case ConvertPartitioned() =>
        throw new UnsupportedOperationException(
          "CONVERT TO DELTA … PARTITIONED BY is unsupported: " +
            "hive-partitioned files lack the partition columns' bytes " +
            "— load with spark.read and write through a " +
            "partition-declared table instead")
      case ConvertDelta(dir, _) =>
        // NO STATISTICS is accepted and ignored: adoption is
        // metadata-only either way, stats arrive via ANALYZE
        Some(s"CALL graft.system.convert(${q(dir)})")
      case VacuumRetain(t, n, unit) =>
        // HOURS maps onto version retention: keep every version whose
        // commit record published inside the window (and the current
        // one) — same clock TIMESTAMP AS OF reads
        val retain = if (unit.equalsIgnoreCase("HOURS")) s"h:$n" else n
        tableArg(t).map(tn =>
          s"CALL graft.system.vacuum(${q(tn)}, ${q(retain)})")
      case Vacuum(t) => tableArg(t).map(n =>
        s"CALL graft.system.vacuum(${q(n)}, '1')")
      case DescHistory(t) => tableArg(t).map(n =>
        s"CALL graft.system.history(${q(n)})")
      case DescDetail(t) => tableArg(t).map(n =>
        s"CALL graft.system.detail(${q(n)})")
      case Restore(t, v) => tableArg(t).map(n =>
        s"CALL graft.system.restore(${q(n)}, ${q(v)})")
      case RestoreTs(t, ts) => tableArg(t).map(n =>
        s"CALL graft.system.restore(${q(n)}, ${q(s"ts:$ts")})")
      // Delta's CREATE TABLE target [SHALLOW|DEEP] CLONE source
      case Clone(target, mode, source) =>
        for (tn <- tableArg(target); sn <- tableArg(source))
          yield s"CALL graft.system.clone(${q(sn)}, ${q(tn)}, " +
            s"${q(mode.toLowerCase(java.util.Locale.ROOT))})"
      case _ => None
    }
}
