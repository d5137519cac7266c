package graft.etl

import org.apache.spark.sql.DataFrame

/** Dedup-on-append: keep only batch rows whose key is not already in the
  * existing table — the reference's `loadIntoDeltaTable` semantics
  * (/root/reference/ETL_pipeline_countries.py:115-138) as a pure plan.
  *
  * `left_anti` shuffles both sides on the key (or broadcasts the smaller
  * side) and never materializes matches — at 100 TB this is the standard
  * incremental-load shape: the "existing keys" side can be a pruned
  * projection (key column only), which Catalyst reduces the scan to.
  */
object DedupAppend {

  /** Rows of `batch` whose `key` does not occur in `existing`. */
  def newRows(batch: DataFrame, existing: DataFrame, key: String): DataFrame =
    batch.join(existing.select(key), Seq(key), "left_anti")

  /** Dedup the batch against existing AND against itself (first writer
    * wins by `orderCol` ascending) — what a retried ingest job needs so
    * the same payload can't double-append.
    */
  def idempotent(batch: DataFrame, existing: DataFrame, key: String,
      orderCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col(key)).orderBy(col(orderCol))
    newRows(
      batch.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .drop("__rn"),
      existing, key)
  }
}
