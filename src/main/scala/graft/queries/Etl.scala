package graft.queries

import graft.Tables
import graft.etl.DedupAppend
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
}
