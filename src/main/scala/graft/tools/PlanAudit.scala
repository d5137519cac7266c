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

  /** Normalized fingerprint of a query's physical plan (12 hex chars
    * of SHA-256): expression ids, plan ids, paths, statistics and
    * other run-varying tokens are stripped so the hash is stable for
    * the same PLAN SHAPE across sessions and rounds — a lost
    * broadcast, a new Exchange, or a join-strategy flip changes it
    * even when timings are too noisy to show the regression.
    * Bench records one per query (`plan_sha` in the JSON artifact);
    * diff round-over-round to catch silent plan drift.
    */
  def fingerprint(df: DataFrame): String = {
    val raw = df.queryExecution.executedPlan.toString()
    val norm = normalizedForTest(raw)
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(norm.getBytes("UTF-8"))
    digest.take(6).map(b => f"$b%02x").mkString
  }

  /** The normalization behind [[fingerprint]], exposed for diffing. */
  private[graft] def normalizedForTest(raw: String): String = {
    val norm = raw
      .replaceAll("#\\d+[A-Za-z]*", "#")        // expression ids
      .replaceAll("plan_id=\\d+", "plan_id=")
      .replaceAll("\\bid=#?\\d+\\b", "id=")
      .replaceAll("(?i)(file|hdfs|s3a?)://?[^\\s,\\)\\]]*", "<path>")
      .replaceAll("/[-\\w./=*@]+", "<path>")     // absolute paths
      .replaceAll("Statistics\\([^)]*\\)", "Statistics()")
      .replaceAll("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}",
        "<uuid>")
      .replaceAll("Batched: \\w+", "Batched:")
      .replaceAll("size=\\d+", "size=")
      .replaceAll("rowCount=\\d+", "rowCount=")
      // JVM-run-varying identities: synthetic lambda class ids
      // (MapPartitions graft.ops.X$$Lambda$2678) and object identity
      // hashes of embedded literals ([B@3095c449 — e.g. a runtime
      // Bloom filter's bytes) change per session without any plan
      // change — both must not flap the fingerprint
      .replaceAll("Lambda\\$\\d+", "Lambda\\$")
      .replaceAll("@[0-9a-f]{4,}", "@")
    norm
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
