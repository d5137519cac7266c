package graft

import graft.etl.Scd2
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** SCD2 build/merge semantics — ground truth recomputed driver-side,
  * and the merge-vs-rebuild equivalence that makes incremental loads
  * trustworthy.
  */
class Scd2Spec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def changes(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.map { case (k, t, v) => (k, ts(t), v) }
      .toDF("k", "ts", "status")
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("k"), col("valid_from"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1),
        Option(r.getTimestamp(2)), r.getLong(3), r.getBoolean(4),
        r.getString(5)))
      .toSeq

  test("build compresses consecutive-equal states and versions intervals") {
    val dim = Scd2.build(changes(
      (1L, "2024-01-01 00:00:00", "a"),
      (1L, "2024-01-02 00:00:00", "a"), // compressed away
      (1L, "2024-01-03 00:00:00", "b"),
      (1L, "2024-01-04 00:00:00", "a"), // a again = new interval
      (2L, "2024-01-01 12:00:00", "x")),
      "k", "ts", Seq("status"))
    assert(rowsOf(dim) == Seq(
      (1L, ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), 1L, false, "a"),
      (1L, ts("2024-01-03 00:00:00"), Some(ts("2024-01-04 00:00:00")), 2L, false, "b"),
      (1L, ts("2024-01-04 00:00:00"), None, 3L, true, "a"),
      (2L, ts("2024-01-01 12:00:00"), None, 1L, true, "x")))
  }

  test("build treats null attribute values with null-safe compression") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), null.asInstanceOf[String]),
      (1L, ts("2024-01-02 00:00:00"), null.asInstanceOf[String]), // equal nulls compress
      (1L, ts("2024-01-03 00:00:00"), "v"))
      .toDF("k", "ts", "status")
    val dim = Scd2.build(df, "k", "ts", Seq("status"))
    assert(dim.count() == 2)
    assert(dim.filter(col("is_current")).select("status").head.getString(0) == "v")
  }

  test("merge(batch) == build(all changes at once)") {
    val c1 = changes(
      (1L, "2024-01-01 00:00:00", "a"),
      (1L, "2024-01-05 00:00:00", "b"),
      (2L, "2024-01-02 00:00:00", "x"),
      (3L, "2024-01-03 00:00:00", "p"))
    val c2 = changes(
      (1L, "2024-01-07 00:00:00", "b"), // no-op: equals current state
      (1L, "2024-01-09 00:00:00", "c"),
      (2L, "2024-01-08 00:00:00", "y"),
      (4L, "2024-01-08 12:00:00", "new")) // brand-new key
    val merged = Scd2.merge(Scd2.build(c1, "k", "ts", Seq("status")),
      c2, "k", "ts", Seq("status"))
    val rebuilt = Scd2.build(c1.unionByName(c2), "k", "ts", Seq("status"))
    assert(rowsOf(merged) == rowsOf(rebuilt))
  }

  test("merge drops late batch rows (at or before the current valid_from)") {
    val dim = Scd2.build(changes(
      (1L, "2024-01-05 00:00:00", "b")), "k", "ts", Seq("status"))
    val merged = Scd2.merge(dim, changes(
      (1L, "2024-01-01 00:00:00", "late"),
      (1L, "2024-01-05 00:00:00", "tie")), "k", "ts", Seq("status"))
    assert(rowsOf(merged) == Seq(
      (1L, ts("2024-01-05 00:00:00"), None, 1L, true, "b")))
  }

  test("merge leaves untouched keys byte-identical") {
    val c1 = changes(
      (1L, "2024-01-01 00:00:00", "a"),
      (2L, "2024-01-02 00:00:00", "x"),
      (2L, "2024-01-04 00:00:00", "y"))
    val dim = Scd2.build(c1, "k", "ts", Seq("status"))
    val merged = Scd2.merge(dim, changes(
      (1L, "2024-01-06 00:00:00", "z")), "k", "ts", Seq("status"))
    val k2Before = rowsOf(dim).filter(_._1 == 2L)
    val k2After = rowsOf(merged).filter(_._1 == 2L)
    assert(k2Before == k2After)
  }
}
