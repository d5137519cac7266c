package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.Bridge

/** Materialized-view substitution — the warehouse feature where a
  * maintained summary table transparently answers queries written
  * against the raw data (the reference platform's materialized
  * views; kept fresh here by
  * [[graft.streaming.DeltaSink.aggregateWriter]]).
  *
  * Matching uses `LogicalPlan.sameResult` on OPTIMIZED plans — the
  * same canonicalized-plan equivalence Spark's own CacheManager uses
  * for `df.cache()` — so it is exact-match semantics (identical query
  * modulo attribute ids / cosmetic differences), never a lossy
  * containment rewrite. The substituted scan is wrapped in a Project
  * that re-binds the MV's output attributes to the original subtree's
  * exprIds, so references above the rewrite stay valid.
  *
  * At 100 TB this turns a full-fact aggregation into a scan of the
  * summary table: the query cost becomes O(groups), and freshness is
  * whatever the maintaining stream's trigger interval is.
  */
object MaterializedViews {

  private case class Mv(definition: LogicalPlan, read: () => DataFrame)
  private val registry = new java.util.concurrent.CopyOnWriteArrayList[Mv]()

  /** Register `mv` (a function producing the CURRENT view contents,
    * e.g. `() => deltaLite.read()`) as materializing `definition`.
    * Column names and types of the view must match the definition's
    * output. Injects the rewrite rule into the session (idempotent).
    */
  def register(spark: SparkSession, definition: DataFrame,
      read: () => DataFrame): Unit = {
    val defOut = definition.queryExecution.optimizedPlan.output
    val mvOut = Bridge.analyzed(read()).output
    require(defOut.map(a => (a.name, a.dataType)) ==
      mvOut.map(a => (a.name, a.dataType)),
      s"view schema ${mvOut.map(_.name)} must match definition ${defOut.map(_.name)}")
    registry.add(Mv(definition.queryExecution.optimizedPlan, read))
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(Rewrite))
      spark.experimental.extraOptimizations = opts :+ Rewrite
  }

  /** Drop every registered view (tests / teardown). */
  def clear(): Unit = registry.clear()

  /** Run `body` with substitution disabled — REQUIRED around any full
    * recompute that refreshes the view itself: a refresh job
    * re-evaluating the registered definition would otherwise be
    * substituted too, silently writing the view's own stale contents
    * back into it. The refresh ACTION (the `.write`/`.collect`, not
    * just the DataFrame construction) must execute INSIDE `body` —
    * optimization happens at action time, and a lazily returned
    * DataFrame acted on later is substituted again. Swaps
    * session-global optimizer state: single-threaded use only. (The
    * incremental path — [[graft.streaming.DeltaSink.aggregateWriter]]
    * merging per-batch deltas — never re-evaluates the definition and
    * needs no bypass.)
    */
  def withoutRewrite[T](spark: SparkSession)(body: => T): T = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved.filterNot(_ == Rewrite)
    try body
    finally spark.experimental.extraOptimizations = saved
  }

  object Rewrite extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (registry.isEmpty) return plan
      plan.transformUp {
        case p =>
          val it = registry.iterator()
          var found: LogicalPlan = null
          while (found == null && it.hasNext) {
            val mv = it.next()
            if (mv.definition.sameResult(p)) {
              val mvPlan = Bridge.analyzed(mv.read())
              val byName = mvPlan.output.map(a => a.name -> a).toMap
              // re-bind the view's columns to the subtree's exprIds so
              // everything referencing the replaced subtree still
              // resolves
              found = Project(p.output.map { want =>
                Alias(byName(want.name), want.name)(exprId = want.exprId)
              }, mvPlan)
            }
          }
          if (found == null) p else found
      }
    }
  }
}
