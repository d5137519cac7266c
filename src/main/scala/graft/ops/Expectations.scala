package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the quality gate a managed
  * pipeline attaches to every table load (the reference platform's
  * "expectations" surface: each rule is a boolean predicate, rows
  * failing a rule are counted, optionally quarantined, or fail the
  * load; cf. /root/reference/README.md "Delta Live Tables").
  *
  * Everything is a plain column expression over one scan: `annotate`
  * adds one boolean per rule (codegen-resident, no UDF), `split` is a
  * single filter each way, and `metrics` is ONE aggregate whose
  * conditional sums combine map-side — at 100 TB the quality report
  * costs one pass and shuffles #rules rows, not data.
  *
  * Null semantics: a predicate evaluating to NULL counts as a
  * violation (`coalesce(pred, false)`) — the conservative gate, and
  * the same choice SQL CHECK constraints make.
  */
object Expectations {

  private def flag(name: String) = s"__expect_$name"

  /** Adds one boolean column per rule plus `__valid` (all rules pass).
    * Rule columns are `__expect_<name>`.
    */
  def annotate(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "expectations need at least one rule")
    // rule names become column names and appear inside a selectExpr in
    // `metrics` — identifiers only, so a name can never break (or
    // inject into) the generated SQL
    rules.foreach { case (name, _) =>
      require(name.matches("[A-Za-z0-9_]+"),
        s"rule name must be an identifier ([A-Za-z0-9_]+): '$name'")
    }
    val flagged = rules.foldLeft(df) { case (d, (name, pred)) =>
      d.withColumn(flag(name), coalesce(pred, lit(false)))
    }
    flagged.withColumn("__valid",
      rules.map(r => col(flag(r._1))).reduce(_ && _))
  }

  /** (valid rows with original columns, quarantine rows with a
    * `failed_rules` array naming every violated rule).
    */
  def split(df: DataFrame, rules: Seq[(String, Column)])
      : (DataFrame, DataFrame) = {
    val a = annotate(df, rules)
    val valid = a.filter(col("__valid"))
      .select(df.columns.toIndexedSeq.map(col): _*)
    val failedList = array(rules.map { case (name, _) =>
      when(!col(flag(name)), lit(name))
    }: _*)
    val quarantine = a.filter(!col("__valid"))
      .withColumn("failed_rules", filter(failedList, _.isNotNull))
      .select(df.columns.toIndexedSeq.map(col) :+ col("failed_rules"): _*)
    (valid, quarantine)
  }

  /** Per-rule pass/fail counts in one aggregate over one scan:
    * (rule, n_pass, n_fail), ordered by rule name.
    */
  def metrics(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val a = annotate(df, rules)
    // coalesce: an EMPTY batch aggregates to null sums — the report
    // must read (0, 0), not (null, null)
    val aggs = rules.flatMap { case (name, _) =>
      Seq(coalesce(sum(when(col(flag(name)), 1L).otherwise(0L)), lit(0L))
          .as(s"__p_$name"),
        coalesce(sum(when(col(flag(name)), 0L).otherwise(1L)), lit(0L))
          .as(s"__f_$name"))
    }
    val wide = a.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row into (rule, n_pass, n_fail)
    val stackArgs = rules.map { case (name, _) =>
      s"'$name', __p_$name, __f_$name"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${rules.size}, $stackArgs) AS (rule, n_pass, n_fail)")
      .orderBy(col("rule"))
  }

  /** Zero-extra-pass metrics via the `Observation` API: the per-rule
    * counts ride the returned frame as OBSERVED metrics and
    * materialize as a side effect of whatever action consumes it (the
    * load itself) — where [[metrics]] spends its own scan, this makes
    * the quality report FREE at 100 TB. Returns the frame (original
    * columns) and a getter that blocks until the consuming action
    * finishes, yielding the same (rule, n_pass, n_fail) rows.
    */
  def observed(df: DataFrame, rules: Seq[(String, Column)],
      name: String = "expectations")
      : (DataFrame, () => Seq[(String, Long, Long)]) = {
    val obs = org.apache.spark.sql.Observation(name)
    val a = annotate(df, rules)
    val aggs = rules.flatMap { case (n, _) =>
      Seq(coalesce(sum(when(col(flag(n)), 1L).otherwise(0L)), lit(0L))
          .as(s"__p_$n"),
        coalesce(sum(when(col(flag(n)), 0L).otherwise(1L)), lit(0L))
          .as(s"__f_$n"))
    }
    val out = a.observe(obs, aggs.head, aggs.tail: _*)
      .select(df.columns.map(col).toSeq: _*)
    val get = () => {
      val m = obs.get
      rules.map { case (n, _) =>
        (n, m(s"__p_$n").asInstanceOf[Long], m(s"__f_$n").asInstanceOf[Long])
      }.sortBy(_._1)
    }
    (out, get)
  }

  /** Gate mode: throws if any rule has a violation, naming the worst
    * offenders — the fail-the-load expectation.
    */
  def enforce(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val bad = metrics(df, rules).filter(col("n_fail") > 0)
      .orderBy(col("n_fail").desc)
      .collect() // #rules rows at most — bounded report, not data
    if (bad.nonEmpty) {
      val detail = bad.map(r =>
        s"${r.getString(0)}: ${r.getLong(2)} violations").mkString("; ")
      throw new IllegalStateException(s"expectations failed — $detail")
    }
    df
  }
}
