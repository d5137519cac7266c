package graft

import graft.ops.Expectations
import org.apache.spark.sql.functions._

/** Expectations: split/metrics/enforce semantics, including the
  * null-counts-as-violation rule.
  */
class ExpectationsSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Some(10.0), "ok"),
      (2L, Some(-5.0), "ok"),   // fails positive
      (3L, None, "ok"),          // null -> fails positive
      (4L, Some(3.0), "bad"),    // fails status
      (5L, Some(0.5), "ok"))
      .toDF("id", "v", "status")
  }

  private val rules = Seq(
    "positive" -> (col("v") > 0),
    "status_ok" -> (col("status") === "ok"))

  test("split: valid rows pass every rule, quarantine names failures") {
    val (valid, quarantine) = Expectations.split(df, rules)
    assert(valid.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 5L))
    assert(valid.columns.toSeq == Seq("id", "v", "status"))
    val q = quarantine.collect()
      .map(r => r.getLong(0) -> r.getSeq[String](3).toSet).toMap
    assert(q == Map(
      2L -> Set("positive"),
      3L -> Set("positive"),
      4L -> Set("status_ok")))
  }

  test("metrics: one row per rule with exact pass/fail counts") {
    val m = Expectations.metrics(df, rules).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(m.toSeq == Seq(
      ("positive", 3L, 2L),
      ("status_ok", 4L, 1L)))
  }

  test("enforce throws on violations, passes through a clean table") {
    val e = intercept[IllegalStateException] {
      Expectations.enforce(df, rules)
    }
    assert(e.getMessage.contains("positive"))
    val clean = df.filter(col("v") > 0 && col("status") === "ok")
    assert(Expectations.enforce(clean, rules).count() == 2)
  }

  test("observed: metrics ride the consuming action, equal to the metrics pass") {
    val (out, get) = Expectations.observed(df, rules)
    assert(out.columns.toSeq == df.columns.toSeq,
      "observed frame must keep the original columns")
    // the consuming action IS the load; metrics come for free with it
    out.write.format("noop").mode("overwrite").save()
    assert(get() == Seq(("positive", 3L, 2L), ("status_ok", 4L, 1L)))
  }
}
