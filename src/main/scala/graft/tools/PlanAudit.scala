package graft.tools

import org.apache.spark.sql.DataFrame

/** Structured physical-plan hygiene report — the checks a perf
  * engineer runs before letting a query near 100 TB, as an API
  * instead of eyeballing `.explain`. The spec suite uses the same
  * markers (PlanAuditSpec); this packages them for users.
  *
  * Parsed from the executed-plan string, which is Spark's stable
  * human surface for these markers (node classes are private[sql]
  * and shift between releases; the rendered names don't).
  */
object PlanAudit {

  case class ScanInfo(format: String, pushedFilters: String,
      readSchema: String)

  case class Report(
      scans: Seq[ScanInfo],
      exchanges: Int,
      broadcastJoins: Int,
      sortMergeJoins: Int,
      codegenSpans: Int,
      warnings: Seq[String]) {
    def clean: Boolean = warnings.isEmpty
    def render: String = {
      val s = scans.zipWithIndex.map { case (sc, i) =>
        s"  scan[$i] ${sc.format} pushed=${sc.pushedFilters} read=${sc.readSchema}"
      }.mkString("\n")
      s"""PlanAudit: exchanges=$exchanges broadcastJoins=$broadcastJoins
         |sortMergeJoins=$sortMergeJoins codegenSpans=$codegenSpans
         |$s
         |${if (warnings.isEmpty) "clean" else warnings.mkString("WARN: ", "\nWARN: ", "")}""".stripMargin
    }
  }

  def audit(df: DataFrame): Report = {
    val plan = df.queryExecution.executedPlan.toString()
    def count(marker: String): Int = marker.r.findAllIn(plan).length
    val scans = "FileScan (\\w+)[^\\n]*".r.findAllIn(plan).matchData.map { m =>
      val line = m.matched
      // no closing-bracket anchor: Spark truncates long field lists
      // with "..." before the bracket ever closes
      ScanInfo(m.group(1),
        "PushedFilters: \\[[^\\]]*".r.findFirstIn(line).getOrElse("-"),
        "ReadSchema: [^\\n]*".r.findFirstIn(line).getOrElse("-"))
    }.toSeq
    val exchanges = count("Exchange (hash|range|Single)")
    val bhj = count("BroadcastHashJoin")
    val smj = count("SortMergeJoin")
    val codegen = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
      .map(_.group(1).toInt).toSet.size
    val warnings = Seq(
      Option.when(plan.contains("CartesianProduct"))(
        "CartesianProduct: all-pairs join — never survives scale"),
      Option.when(plan.contains("BroadcastNestedLoopJoin"))(
        "BroadcastNestedLoopJoin: non-equi join fallback — check the join keys"),
      Option.when(plan.contains("BatchEvalPython") || plan.contains("ScalaUDF"))(
        "UDF in the plan — breaks codegen and pushdown around it"),
      Option.when(scans.exists(s => s.pushedFilters.trim.endsWith("[") &&
          plan.contains("Filter ")))(
        "a scan has an empty PushedFilters under a Filter — predicate not reaching the format")
    ).flatten
    Report(scans, exchanges, bhj, smj, codegen, warnings)
  }
}
