package org.apache.spark.sql.graftbridge

import graft.catalog.GraftTable
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{AddCheckConstraint, AlterTableCommand, DeleteFromTable, LogicalPlan, MergeIntoTable, Project, UpdateTable, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.execution.datasources.DataSource
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.execution.streaming.runtime.StreamingRelation

/** Resolution rule that turns a [[GraftTable]] READ into the table's
  * own skipping-index scan: the analyzer resolves `graft.db.t` to a
  * `DataSourceV2Relation(GraftTable)`, and this rule substitutes the
  * plan of `DeltaLite.readIndexed()` (HadoopFsRelation over the
  * commit-log FileIndex → full pushdown/pruning/codegen) with the
  * relation's output attribute ids preserved, so every parent
  * reference keeps resolving. Time-travel reads (`VERSION AS OF` /
  * `TIMESTAMP AS OF`) substitute the corresponding snapshot read.
  *
  * WRITE positions are left to the DSv2 write path (GraftTable's
  * V1 InsertableRelation): a `V2WriteCommand`'s `table` child is
  * skipped, only its `query` subtree is rewritten. This is the Delta
  * connector's DeltaAnalysis integration shape — a DSv2 catalog whose
  * reads resolve to a v1 file relation. Lives in graftbridge because
  * `DataSourceV2Relation` and `LogicalRelation` are spark-internal.
  */
object GraftCatalogReads extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = rewrite(plan)

  private def rewrite(p: LogicalPlan): LogicalPlan = p match {
    case w: V2WriteCommand =>
      // keep the relation in write position; reads inside the query
      // subtree (e.g. INSERT INTO t SELECT … FROM t) still substitute
      val q = rewrite(w.query)
      if (q eq w.query) w else w.withNewQuery(q)
    case a: AddCheckConstraint =>
      // ALTER TABLE … ADD CONSTRAINT … CHECK: the child is the DDL's
      // TARGET, not a read — substituting it to a file relation makes
      // ResolveSessionCatalog misread the command as a session-catalog
      // v1 ALTER (LogicalRelation with no catalogTable → None.get).
      // Left alone, the constraint resolves to a V2 AddConstraint
      // change against the DSv2 relation.
      a
    case a: AlterTableCommand =>
      // same: every ALTER TABLE command holds its table in command
      // position (DropConstraint, AddColumns, …)
      a
    case d: DeleteFromTable =>
      // DELETE FROM t WHERE …: the relation is the DELETE's target,
      // not a read — DataSourceV2Strategy must see the DSv2 relation
      // to route through SupportsDelete; leave the subtree untouched
      d
    case u: UpdateTable =>
      // UPDATE target: GraftDml (post-hoc) converts the whole command
      u
    case m: MergeIntoTable =>
      // MERGE: the TARGET stays for GraftDml; the SOURCE is a genuine
      // read and still substitutes (a graft-table source scans through
      // the skipping FileIndex)
      val s = rewrite(m.sourceTable)
      if (s eq m.sourceTable) m else m.copy(sourceTable = s)
    case d: DataSourceV2Relation if d.table.isInstanceOf[GraftTable] =>
      val gt = d.table.asInstanceOf[GraftTable]
      // Delta's DataFrame reader options on named tables:
      //   spark.read.option("versionAsOf", 3).table("graft.db.t")
      //   spark.read.option("timestampAsOf", "…").table(…)
      //   spark.read.option("readChangeFeed", "true")
      //     .option("startingVersion", 0)[.option("endingVersion", n)]
      //     .table(…)   — the batch CDF read
      val opts = d.options
      def opt(k: String) = Option(opts.get(k)).map(_.trim).filter(_.nonEmpty)
      val srcDf =
        if (opt("readChangeFeed").exists(_.toBoolean)) {
          val from = opt("startingVersion").map(_.toInt).getOrElse(0) - 1
          val to = opt("endingVersion").map(_.toInt)
            .orElse(gt.delta.latestVersion)
            .getOrElse(sys.error(s"empty table ${d.table.name}"))
          gt.delta.changesBetween(from, to)
        } else (opt("versionAsOf"), opt("timestampAsOf")) match {
          case (Some(v), _) => gt.delta.readAsOf(v.toInt)
          case (_, Some(ts)) =>
            gt.delta.readAsOfTime(java.sql.Timestamp.valueOf(ts))
          case _ => gt.readDf()
        }
      val src = srcDf.queryExecution.analyzed
      if (src.output.length < d.output.length ||
        d.output.map(_.name) !=
          src.output.take(d.output.length).map(_.name))
        sys.error(s"as-of read of ${d.table.name}: that snapshot's " +
          s"schema (${src.output.map(_.name).mkString(",")}) does not " +
          s"line up with the current one " +
          s"(${d.output.map(_.name).mkString(",")}); use SQL " +
          "`VERSION AS OF` / `TIMESTAMP AS OF`, which reports the " +
          "snapshot's own schema")
      // extra columns (the CDF's _change_type/_commit_version) ride
      // the substituted output so selects above resolve them by name
      Project(d.output.zip(src.output).map { case (o, n) =>
        Alias(n, o.name)(exprId = o.exprId)
      } ++ src.output.drop(d.output.length), src)
    // `spark.readStream.table("graft.db.t")`: the analyzer resolves
    // the named table to a StreamingRelationV2 over the DSv2
    // GraftTable; substitute the V1 DeltaLiteSource relation (path =
    // the table's root, reader options passed through — readChangeFeed
    // / ignoreChanges / maxVersionsPerBatch keep their meaning) with
    // the V2 attribute ids preserved. The CDF option widens the
    // source schema; the extra _change_type/_commit_version columns
    // ride the substituted output so selects above resolve them.
    case s: StreamingRelationV2 if s.table.isInstanceOf[GraftTable] =>
      val gt = s.table.asInstanceOf[GraftTable]
      if (gt.asOfVersion.nonEmpty || gt.asOfTimestampMicros.nonEmpty)
        throw new UnsupportedOperationException(
          s"cannot stream a time-travel read of ${s.sourceName}; " +
            "stream the current table and bound versions with " +
            "maxVersionsPerBatch instead")
      import scala.jdk.CollectionConverters._
      val ds = DataSource(gt.delta.spark,
        className = classOf[graft.streaming.DeltaSourceProvider].getName,
        options = s.extraOptions.asScala.toMap + ("path" -> gt.delta.root))
      val v1 = StreamingRelation(ds)
      Project(s.output.zip(v1.output).map { case (o, n) =>
        Alias(n, o.name)(exprId = o.exprId)
      } ++ v1.output.drop(s.output.length), v1)
    case other => other.mapChildren(rewrite)
  }
}
