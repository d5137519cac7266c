package graft

import org.apache.spark.sql.SparkSessionExtensions

/** `spark.sql.extensions=graft.GraftExtensions` injects the engine's
  * custom planner strategies into any session at build time; the
  * programmatic path (`graft.plans.TopK.register`) does the same on a
  * live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
}
