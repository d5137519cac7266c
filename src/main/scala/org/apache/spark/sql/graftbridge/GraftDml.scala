package org.apache.spark.sql.graftbridge

import graft.catalog.GraftTable
import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression, GetStructField}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** SQL `UPDATE` and `MERGE INTO` for catalog-addressed DeltaLite
  * tables — the Delta connector's integration shape (a post-hoc
  * resolution rule converts the analyzed command into a runnable
  * command over the table API) rather than SupportsRowLevelOperations,
  * whose group-based rewrite would route the scan around the
  * commit-log FileIndex.
  *
  * UPDATE routes to [[graft.etl.DeltaLite.updateWhere]] (file-granular
  * copy-on-write: only files with matching rows rewrite). MERGE routes
  * to [[graft.etl.DeltaLite.merge]]'s assignment form (file-granular
  * via key-range pruning; the batch join broadcasts the source).
  *
  * Supported MERGE shape (rejected otherwise, with a pointer to the
  * Scala API): `ON` a conjunction of column equalities
  * (`t.k1 = s.k1 AND t.k2 = s.k2 …` — the composite business key), at
  * most one WHEN MATCHED UPDATE, one WHEN MATCHED DELETE, one WHEN
  * NOT MATCHED INSERT, one WHEN NOT MATCHED BY SOURCE UPDATE and one
  * … BY SOURCE DELETE (the mirror-sync clauses), each with an
  * optional AND condition. `MERGE WITH SCHEMA EVOLUTION` star clauses
  * evolve new source columns (metadata-only widen, then the command
  * re-extends the analyzer's star expansion). UPDATE SET supports
  * nested struct fields (`SET a.b = …` rebuilds the struct via
  * withField).
  *
  * Expression conversion: the analyzed command's attribute references
  * are rebound BY NAME into the table-API scope (`t`/`s` aliases for
  * merge, bare names for update) — the same rebinding every
  * `foreachBatch`-style bridge does. Subqueries in conditions are
  * rejected (they would capture the wrong plan).
  */
object GraftDml extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u @ UpdateTable(target, assignments, cond) if u.resolved =>
      graftRelation(target) match {
        case Some(rel) =>
          val out = rel.output
          val set = assignments.map { a =>
            val v = toCol(a.value, Map(byExprId(out) -> ""))
            fieldPath(a.key, byExprId(out)) match {
              case Some(Seq(name)) => name -> v
              case Some(path) =>
                // SET a.b.c = v → rebuild the struct column in place
                // (withField walks dot-separated nested paths)
                path.head ->
                  org.apache.spark.sql.functions.col(path.head)
                    .withField(path.tail.mkString("."), v)
              case None => fail(s"unsupported UPDATE target ${a.key.sql}")
            }
          }
          val where = cond.map(toCol(_, Map(byExprId(out) -> "")))
            .getOrElse(Bridge.column(
              org.apache.spark.sql.catalyst.expressions.Literal(true)))
          GraftUpdateCommand(table(rel), where, set)
        case None => u
      }

    case m: MergeIntoTable if m.resolved =>
      graftRelation(m.targetTable) match {
        case Some(rel) => convertMerge(m, rel)
        case None => m
      }

    // ALTER TABLE t ADD CONSTRAINT name CHECK (cond): Spark's own
    // AddCheckConstraintExec would validate existing data through the
    // DSv2 scan (our anchor-only scan refuses to execute), so the
    // command converts here and validation runs through
    // DeltaLite.addCheckConstraint's substituted read instead — same
    // one-scan price, same loud violation report.
    case a: AddCheckConstraint if a.childrenResolved =>
      // the child is the analyzer's validation query —
      // Filter(NOT cond) over the target relation; the target is what
      // we need, validation re-runs inside addCheckConstraint
      val target = a.child match {
        case Filter(_, c) => c
        case c => c
      }
      graftRelation(target) match {
        case Some(rel) =>
          val chk = a.checkConstraint
          GraftAddConstraintCommand(table(rel), chk.name, chk.condition)
        case None => a
      }

    case other => other
  }

  private def fail(msg: String): Nothing =
    throw new UnsupportedOperationException(
      s"$msg; use the graft.etl.DeltaLite Scala API for this shape")

  private def table(rel: DataSourceV2Relation): GraftTable =
    rel.table.asInstanceOf[GraftTable]

  /** The DSv2 relation under optional aliases, when it is a GraftTable
    * (and not a time-travel read — those are not writable).
    */
  private def graftRelation(p: LogicalPlan): Option[DataSourceV2Relation] =
    EliminateSubqueryAliases(p) match {
      case d: DataSourceV2Relation if d.table.isInstanceOf[GraftTable] =>
        val gt = d.table.asInstanceOf[GraftTable]
        require(gt.asOfVersion.isEmpty && gt.asOfTimestampMicros.isEmpty,
          s"cannot write to a time-travel read of ${gt.name()}")
        Some(d)
      case _ => None
    }

  private def byExprId(out: Seq[Attribute]): Set[Long] =
    out.map(_.exprId.id).toSet

  /** Rebind an analyzed expression into Column scope: attributes are
    * replaced by (optionally qualified) name lookups according to
    * which relation's output they came from. Subqueries rejected.
    */
  private def toCol(e: Expression, scopes: Map[Set[Long], String]): Column = {
    val rebound = e.transform {
      case a: AttributeReference =>
        scopes.collectFirst {
          case (ids, qual) if ids(a.exprId.id) =>
            if (qual.isEmpty) UnresolvedAttribute(Seq(a.name))
            else UnresolvedAttribute(Seq(qual, a.name))
        }.getOrElse(fail(s"reference ${a.name} escapes the DML scope"))
    }
    if (rebound.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]))
      fail("subqueries in DML conditions are not supported")
    Bridge.column(rebound)
  }

  /** Column-rooted field path of an assignment target: `a` → [a],
    * `a.b.c` (GetStructField chain) → [a, b, c]; None for anything
    * else (array/map writes are not assignable). The root attribute
    * must belong to the target relation.
    */
  private def fieldPath(e: Expression, tIds: Set[Long]): Option[Seq[String]] =
    e match {
      case ar: AttributeReference if tIds(ar.exprId.id) => Some(Seq(ar.name))
      case g: GetStructField =>
        fieldPath(g.child, tIds).map(_ :+ g.extractFieldName)
      case _ => None
    }

  /** Split a conjunction into its conjuncts. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def convertMerge(m: MergeIntoTable,
      rel: DataSourceV2Relation): LogicalPlan = {
    // WITH SCHEMA EVOLUTION: the analyzer expands SET * / INSERT *
    // against the CURRENT target schema, so new source columns are
    // absent from the analyzed assignments — the command re-extends
    // star clauses with them and widens the table (metadata-only)
    // before the merge runs. Evolution applies to the star UPDATE
    // (fromStar) and to the INSERT clause (an explicit full column
    // list is indistinguishable post-analysis; the user asked for
    // evolution explicitly).
    val tIds = byExprId(rel.output)
    val sOut = m.sourceTable.output
    val sIds = byExprId(sOut)
    // ON must be a conjunction of column equalities: each conjunct has
    // a bare target attribute on one side (the keys the file-pruning
    // contract needs), any source-only expression on the other (the
    // analyzer often wraps the source side in an implicit type-up
    // cast — kept verbatim). Composite keys are the AND of them.
    def sourceOnly(e: Expression): Boolean =
      e.references.nonEmpty && e.references.forall(a => sIds(a.exprId.id))
    val keyPairs: Seq[(String, Column)] = conjuncts(m.mergeCondition).map {
      case EqualTo(a: AttributeReference, r)
        if tIds(a.exprId.id) && sourceOnly(r) =>
        (a.name, toCol(r, Map(sIds -> "")))
      case EqualTo(l, b: AttributeReference)
        if tIds(b.exprId.id) && sourceOnly(l) =>
        (b.name, toCol(l, Map(sIds -> "")))
      case other => fail("MERGE ON must be a conjunction of " +
        s"t.key = s.key equalities (got ${other.sql})")
    }
    if (keyPairs.map(_._1).distinct.size != keyPairs.size)
      fail(s"MERGE ON repeats a target key (${keyPairs.map(_._1)})")
    // the command surfaces each join value under the target key's name
    // on the source frame; a pre-existing same-named source column
    // whose values are NOT the join key would be silently clobbered
    // for the clause expressions — reject instead
    val sameNamedJoinAttrs = m.mergeCondition.references
      .filter(a => sIds(a.exprId.id)).map(_.name).toSet
    keyPairs.foreach { case (tKeyName, _) =>
      if (sOut.exists(_.name == tKeyName) &&
          !sameNamedJoinAttrs.contains(tKeyName))
        fail(s"merge source already has a column '$tKeyName' that is not " +
          "the join key; alias it away in the USING subquery")
    }
    val scopes = Map(tIds -> "t", sIds -> "s")
    var deleteWhen: Option[Column] = None
    var updateWhen: Option[Column] = None
    var updateSet: Option[Seq[(String, Column)]] = None
    var updateFromStar = false
    val trueCol = Bridge.column(
      org.apache.spark.sql.catalyst.expressions.Literal(true))
    m.matchedActions.foreach {
      case DeleteAction(cond) =>
        if (deleteWhen.isDefined) fail("at most one WHEN MATCHED DELETE")
        deleteWhen = Some(cond.map(toCol(_, scopes)).getOrElse(trueCol))
      case UpdateAction(cond, assignments, fromStar) =>
        if (updateSet.isDefined) fail("at most one WHEN MATCHED UPDATE")
        updateFromStar = fromStar
        updateWhen = Some(cond.map(toCol(_, scopes)).getOrElse(trueCol))
        updateSet = Some(assignments.map { a =>
          val v = toCol(a.value, scopes)
          fieldPath(a.key, tIds) match {
            case Some(Seq(name)) => name -> v
            case Some(path) => path.head ->
              org.apache.spark.sql.functions.col("t." + path.head)
                .withField(path.tail.mkString("."), v)
            case None => fail(s"unsupported UPDATE target ${a.key.sql}")
          }
        })
      case other => fail(s"unsupported matched action $other")
    }
    var insertWhen: Option[Column] = None
    var insertSet: Option[Seq[(String, Column)]] = None
    m.notMatchedActions.foreach {
      case InsertAction(cond, assignments) if true =>
        if (insertSet.isDefined) fail("at most one WHEN NOT MATCHED INSERT")
        // insert expressions see only the source row
        insertWhen = Some(cond.map(toCol(_, Map(sIds -> "s"))).getOrElse(trueCol))
        insertSet = Some(assignments.map { a =>
          val name = a.key match {
            case ar: AttributeReference if tIds(ar.exprId.id) => ar.name
            case other => fail(s"unsupported INSERT target ${other.sql}")
          }
          name -> toCol(a.value, Map(sIds -> "s"))
        })
      case other => fail(s"unsupported not-matched action $other")
    }
    // SQL MERGE clauses fire in STATEMENT order (the first clause
    // whose condition holds wins); the table API's fixed
    // delete-before-update precedence reproduces that only when the
    // DELETE clause precedes the UPDATE clause. For the update-first
    // order, rewrite the delete condition to fire only when the
    // update clause did NOT (null-safe: a NULL condition counts as
    // not-taken, as SQL's WHEN...AND does).
    import org.apache.spark.sql.functions.{coalesce => sqlCoalesce, lit => sqlLit}
    def statementOrder(actions: Seq[MergeAction],
        updWhen: Option[Column], delWhen: Option[Column]): Option[Column] = {
      val updIdx = actions.indexWhere(_.isInstanceOf[UpdateAction])
      val delIdx = actions.indexWhere(_.isInstanceOf[DeleteAction])
      (updWhen, delWhen) match {
        case (Some(u), Some(d)) if updIdx >= 0 && delIdx > updIdx =>
          Some(!sqlCoalesce(u, sqlLit(false)) && d)
        case _ => delWhen
      }
    }
    deleteWhen = statementOrder(m.matchedActions, updateWhen, deleteWhen)
    // matched rows with no matching clause keep their target row; the
    // key-API default is update-all, so an absent UPDATE clause must
    // pin updateWhen to false. Both sets stay DEFINED (empty = no
    // assignments) so the table API always takes the assignment form —
    // SQL already validated the clause types; the star form's strict
    // source-mirrors-table schema check must not apply (a DELETE-only
    // merge source legitimately carries none of the table's columns).
    val falseCol = Bridge.column(
      org.apache.spark.sql.catalyst.expressions.Literal(false))
    if (updateSet.isEmpty) { updateWhen = Some(falseCol); updateSet = Some(Nil) }
    if (insertSet.isEmpty) { insertWhen = Some(falseCol); insertSet = Some(Nil) }
    // WHEN NOT MATCHED BY SOURCE: conditions and assignments see the
    // TARGET row only (there is no source row) — t-scope rebinding
    var bsDeleteWhen: Option[Column] = None
    var bsUpdateWhen: Option[Column] = None
    var bsUpdateSet: Option[Seq[(String, Column)]] = None
    m.notMatchedBySourceActions.foreach {
      case DeleteAction(cond) =>
        if (bsDeleteWhen.isDefined)
          fail("at most one WHEN NOT MATCHED BY SOURCE DELETE")
        bsDeleteWhen = Some(cond.map(toCol(_, Map(tIds -> "t"))).getOrElse(trueCol))
      case UpdateAction(cond, assignments, _) =>
        if (bsUpdateSet.isDefined)
          fail("at most one WHEN NOT MATCHED BY SOURCE UPDATE")
        bsUpdateWhen = Some(cond.map(toCol(_, Map(tIds -> "t"))).getOrElse(trueCol))
        bsUpdateSet = Some(assignments.map { a =>
          val v = toCol(a.value, Map(tIds -> "t"))
          fieldPath(a.key, tIds) match {
            case Some(Seq(name)) => name -> v
            case Some(path) => path.head ->
              org.apache.spark.sql.functions.col("t." + path.head)
                .withField(path.tail.mkString("."), v)
            case None => fail(s"unsupported UPDATE target ${a.key.sql}")
          }
        })
      case other => fail(s"unsupported not-matched-by-source action $other")
    }
    // same statement-order correction for the BY SOURCE clause family
    bsDeleteWhen = statementOrder(m.notMatchedBySourceActions,
      bsUpdateWhen, bsDeleteWhen)
    // columns to evolve: source outputs absent from the target schema
    // (only when a star UPDATE or a star INSERT clause can write them)
    val evolveCols: Seq[(String, org.apache.spark.sql.types.DataType)] =
      if (!m.withSchemaEvolution) Nil
      else sOut.filterNot(a => rel.output.exists(_.name == a.name))
        .map(a => a.name -> a.dataType).toSeq
    // Whether the INSERT clause is the analyzer's star expansion:
    // it assigns EVERY pre-evolution target column from the
    // same-named bare source attribute (modulo the implicit type-up
    // cast). Only such a clause is re-extended with evolved columns
    // (Delta's INSERT * behavior); an explicit PARTIAL column list
    // keeps evolved columns NULL, exactly as Delta leaves columns
    // absent from an explicit list NULL. DOCUMENTED DIVERGENCE: an
    // explicit list that names every target column with same-named
    // source values is indistinguishable from INSERT * after analysis
    // (InsertAction carries no star flag) and is treated as star —
    // Delta would leave the evolved columns NULL there.
    def stripCast(e: Expression): Expression = e match {
      case c: org.apache.spark.sql.catalyst.expressions.Cast => stripCast(c.child)
      case other => other
    }
    val insertLooksStar = m.notMatchedActions.exists {
      case InsertAction(_, assignments) =>
        assignments.size == rel.output.size &&
          assignments.forall { a =>
            (a.key match {
              case ar: AttributeReference if tIds(ar.exprId.id) => Some(ar.name)
              case _ => None
            }).exists(n => stripCast(a.value) match {
              case sr: AttributeReference => sIds(sr.exprId.id) && sr.name == n
              case _ => false
            })
          }
      case _ => false
    }
    val hasInsert = m.notMatchedActions.nonEmpty
    val starInsert = hasInsert && insertLooksStar
    GraftMergeCommand(table(rel), m.sourceTable, keyPairs.map(_._1),
      keyPairs.map(_._2), deleteWhen, updateWhen, updateSet, insertWhen,
      insertSet, bsDeleteWhen, bsUpdateWhen, bsUpdateSet,
      if (updateFromStar || starInsert) evolveCols else Nil,
      updateFromStar, starInsert)
  }
}

/** `UPDATE graft.db.t SET … WHERE …` → file-granular copy-on-write. */
case class GraftAddConstraintCommand(
    @transient graftTable: GraftTable,
    constraintName: String,
    conditionSql: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graftTable.delta.addCheckConstraint(constraintName, conditionSql)
    Nil
  }
}

case class GraftUpdateCommand(
    @transient graftTable: GraftTable,
    @transient where: Column,
    @transient set: Seq[(String, Column)]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graftTable.delta.updateWhere(where, set)
    Nil
  }
}

/** `MERGE INTO graft.db.t USING src ON … WHEN …` → key-based merge
  * over the (possibly composite) business key, including the
  * NOT MATCHED BY SOURCE mirror-sync clauses.
  */
case class GraftMergeCommand(
    @transient graftTable: GraftTable,
    @transient sourcePlan: LogicalPlan,
    targetKeys: Seq[String],
    @transient sourceKeyCols: Seq[Column],
    @transient deleteWhen: Option[Column],
    @transient updateWhen: Option[Column],
    @transient updateSet: Option[Seq[(String, Column)]],
    @transient insertWhen: Option[Column],
    @transient insertSet: Option[Seq[(String, Column)]],
    @transient bySourceDeleteWhen: Option[Column],
    @transient bySourceUpdateWhen: Option[Column],
    @transient bySourceUpdateSet: Option[Seq[(String, Column)]],
    @transient evolveCols: Seq[(String, org.apache.spark.sql.types.DataType)] = Nil,
    evolveUpdate: Boolean = false,
    evolveInsert: Boolean = false)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val srcRaw = Bridge.ofRows(spark, sourcePlan)
    // the table API joins on shared key NAMES: surface each join
    // value under the target key's name (replaces a same-named source
    // column only when it IS the join attribute — rule-checked)
    val src = targetKeys.zip(sourceKeyCols).foldLeft(srcRaw) {
      case (df, (name, c)) => df.withColumn(name, c)
    }
    // WITH SCHEMA EVOLUTION: widen the table (metadata-only) and
    // re-extend the star clauses with the new source columns the
    // analyzer's star expansion could not see
    if (evolveCols.nonEmpty) {
      val existing = graftTable.delta.schema
        .map(_.fieldNames.toSet).getOrElse(Set.empty)
      evolveCols.filterNot(c => existing.contains(c._1))
        .foreach { case (n, dt) => graftTable.delta.addColumn(n, dt) }
    }
    def extend(set: Option[Seq[(String, Column)]], on: Boolean) =
      if (!on || evolveCols.isEmpty) set
      else set.map(_ ++ evolveCols.map { case (n, _) =>
        n -> org.apache.spark.sql.functions.col("s." + n)
      })
    graftTable.delta.mergeOn(src, targetKeys,
      deleteWhen = deleteWhen, updateWhen = updateWhen,
      insertWhen = insertWhen,
      updateSet = extend(updateSet, evolveUpdate),
      insertSet = extend(insertSet, evolveInsert),
      bySourceDeleteWhen = bySourceDeleteWhen,
      bySourceUpdateWhen = bySourceUpdateWhen,
      bySourceUpdateSet = bySourceUpdateSet)
    Nil
  }
}
