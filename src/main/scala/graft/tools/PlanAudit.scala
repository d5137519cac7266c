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

  /** STRUCTURAL fingerprint of a query's physical plan (12 hex chars
    * of SHA-256 over the tree's shape): per line, the tree depth plus
    * the operator tokens that define the plan's strategy — node name,
    * exchange partitioning kind, join type, scan format. A lost
    * broadcast, a new Exchange, a join-strategy flip or an
    * added/removed operator changes it; argument text is deliberately
    * EXCLUDED because it is unstable for the same shape (Spark
    * truncates long argument strings at width budgets that shift with
    * expression-id digits; Catalyst emits equivalent plans with
    * reordered grouping keys; lambda variables and object identity
    * hashes differ per run). Bench records one per query (`plan_sha`
    * in the JSON artifact); diff round-over-round to catch silent plan
    * drift even when timings are too noisy to show it. Argument-level
    * hygiene (pushed filters, read schemas) is [[audit]]'s job.
    */
  def fingerprint(df: DataFrame): String = {
    val norm = normalizedForTest(df.queryExecution.executedPlan.toString())
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(norm.getBytes("UTF-8"))
    digest.take(6).map(b => f"$b%02x").mkString
  }

  // strategy-bearing keywords worth keeping beyond the node name
  private val StrategyTokens = Set(
    "hashpartitioning", "rangepartitioning", "SinglePartition",
    "RoundRobinPartitioning", "ENSURE_REQUIREMENTS", "REPARTITION_BY_NUM",
    "REBALANCE_PARTITIONS_BY_NONE",
    "Inner", "LeftOuter", "RightOuter", "FullOuter", "LeftSemi",
    "LeftAnti", "Cross", "ExistenceJoin",
    "BuildLeft", "BuildRight",
    "parquet", "orc", "json", "csv", "text")

  /** The line-signature reduction behind [[fingerprint]] — exposed so
    * a regression can be diffed as text, not just as hashes.
    */
  private[graft] def normalizedForTest(raw: String): String = {
    val word = "[A-Za-z_][A-Za-z0-9_]*".r
    raw.linesIterator
      // AQE prints "== Final Plan ==" sections when executed; the
      // section markers and empty lines carry no structure
      .filterNot(l => l.trim.isEmpty || l.contains("== "))
      .map { line =>
        // a node's connector is "+-" (last child) OR ":-" (non-last
        // child, e.g. every join's first child); both mark the depth.
        // Taking only "+-" collapsed left subtrees to depth 0 and let
        // reparenting regressions hash identically.
        val depth = (line.indexOf("+-"), line.indexOf(":-")) match {
          case (-1, -1) => 0
          case (-1, c) => c
          case (p, -1) => p
          case (p, c) => math.min(p, c)
        }
        // strip tree-drawing + the codegen star "*(12) " so the node
        // name is the first word; keep every strategy-bearing token
        val body = line.dropWhile(c => !c.isLetter)
        val words = word.findAllIn(body).toList
        val name = words.headOption.getOrElse("")
        val extra = words.drop(1).filter(StrategyTokens)
        s"$depth ${(name +: extra).mkString(" ")}"
      }
      .mkString("\n")
  }

  def audit(df: DataFrame): Report = {
    val plan = df.queryExecution.executedPlan.toString()
    def count(marker: String): Int = marker.r.findAllIn(plan).length
    val scans = "FileScan (\\w+)[^\\n]*".r.findAllIn(plan).matchData.map { m =>
      val line = m.matched
      // no closing-bracket anchor: Spark truncates long field lists
      // with "..." before the bracket ever closes; capture the VALUE,
      // not the labeled fragment
      ScanInfo(m.group(1),
        "PushedFilters: \\[([^\\]]*)".r.findFirstMatchIn(line)
          .map(_.group(1)).getOrElse("-"),
        "ReadSchema: (\\S+)".r.findFirstMatchIn(line)
          .map(_.group(1)).getOrElse("-"))
    }.toSeq
    // every shuffle flavor counts (hash/range/single/round-robin);
    // BroadcastExchange is not a shuffle and is reported via the join
    val exchanges = count("Exchange (hash|range|Single|RoundRobin)")
    val bhj = count("BroadcastHashJoin")
    val smj = count("SortMergeJoin")
    val codegen = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
      .map(_.group(1).toInt).toSet.size
    val warnings = Seq(
      Option.when(plan.contains("CartesianProduct"))(
        "CartesianProduct: all-pairs join — never survives scale"),
      Option.when(plan.contains("BroadcastNestedLoopJoin"))(
        "BroadcastNestedLoopJoin: non-equi join fallback — check the join keys"),
      // anonymous Scala UDFs render as `UDF(...)`; a NAMED udf renders
      // under its registered name and is not detectable from the plan
      // string — this flags the common case, not every case
      Option.when(plan.contains("BatchEvalPython") ||
          "\\bUDF\\(".r.findFirstIn(plan).isDefined)(
        "UDF in the plan — breaks codegen and pushdown around it")
    ).flatten
    Report(scans, exchanges, bhj, smj, codegen, warnings)
  }
}
