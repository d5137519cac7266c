package graft.queries

import graft.Tables
import graft.etl.{DedupAppend, Scd2}
import graft.ops.Expectations
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-surface ETL as oracled queries (SURVEY.md §2b). */
object Etl {

  /** Semi-structured extraction: pull a typed field out of the JSON
    * `props` column — the same shape as the reference's API-response
    * flattening, on the engine's events table. `get_json_object` is a
    * codegen'd path extraction; no UDF.
    */
  def jsonExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"event_id",
        get_json_object($"props", "$.k").cast("int").as("k"),
        $"event_type", $"value")
      .filter($"k" >= 50)
      .orderBy($"event_id")
  }

  /** Dedup-on-append through the library operator: the batch is the full
    * documents table, the "existing table" is the already-loaded subset
    * (doc_id ≡ 0 mod 10) — output is exactly the rows an incremental
    * load would append. Mirrors reference loadIntoDeltaTable.
    */
  def dedupAppend(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val existing = docs.filter($"doc_id" % 10 === 0)
    DedupAppend.newRows(docs, existing, "doc_id")
      .select($"doc_id", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  /** Data-quality expectations over the load: per-rule pass/fail
    * counts in ONE aggregate over one scan (`ops.Expectations`) — the
    * quality gate a managed pipeline attaches to every table
    * (violations counted map-side; the shuffle carries #rules rows).
    * Thresholds chosen so some rules are clean and some catch rows.
    */
  def expectations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Expectations.metrics(Tables.lineitem(s, dir), Seq(
      "discount_capped" -> ($"l_discount" <= 0.08),
      "price_floor" -> ($"l_extendedprice" >= 5000.0),
      "qty_positive" -> ($"l_quantity" > 0.0),
      "qty_under_46" -> ($"l_quantity" <= 45.0),
      "tax_under_6pct" -> ($"l_tax" < 0.06)))
  }

  /** SCD2 dimension build from the events change log: each user's
    * event_type stream becomes versioned [valid_from, valid_to)
    * intervals with consecutive-equal compression — one shuffle, two
    * stacked window passes (`etl.Scd2.build`).
    */
  def scd2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Scd2.build(Tables.events(s, dir), "user_id", "ts",
      attrs = Seq("event_type"), tieBreak = Seq("event_id"))
      .orderBy($"user_id", $"valid_from")
  }
}
