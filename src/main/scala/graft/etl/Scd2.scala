package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: turn a change log (one row per
  * observed state of a key) into a versioned dimension with
  * [valid_from, valid_to) intervals — the warehouse-side history
  * tracking the reference's incremental loads feed (cf.
  * /root/reference/ETL_pipeline_countries.py:128-147, whose merge
  * keeps only latest state; SCD2 keeps all of them, queryable as-of
  * any time).
  *
  * Scale posture: `build` is two window passes over the SAME
  * (key, order) partitioning — one shuffle total, no self-join.
  * `merge` touches only the batch's keys: current rows of affected
  * keys union the batch, rebuilt per-key, everything else passes
  * through untouched — O(batch keys), never O(history).
  */
object Scd2 {

  /** Build the full SCD2 dimension from a change log.
    *
    * Consecutive rows of a key with identical tracked attributes are
    * compressed into one interval (null-safe comparison, so
    * null-valued attributes compress too). `valid_to` is the next
    * version's `valid_from`, null for the current row; `version`
    * numbers intervals 1..n per key.
    *
    * @param tieBreak extra order columns for changes sharing a
    *   timestamp — required for determinism if ts can tie
    */
  def build(changes: DataFrame, key: String, ts: String,
      attrs: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    require(attrs.nonEmpty, "SCD2 needs at least one tracked attribute")
    val order = (col(ts) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    // the first row per key is kept unconditionally (a null-valued
    // attribute would otherwise null-safe-match its null lag and drop
    // the key's opening interval); after it, a row survives iff any
    // tracked attribute differs null-safely from the previous row.
    // All windows share (key, order) partitioning, so the whole build
    // is one shuffle + one sort.
    val changed = (row_number().over(w) === 1) || attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    changes
      .withColumn("__chg", changed)
      .filter(col("__chg"))
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .select(Seq(col(key), col("valid_from"), col("valid_to"),
        col("version"), col("is_current")) ++ attrs.map(col): _*)
  }

  /** Apply a batch of new changes to an existing SCD2 dimension.
    *
    * Only keys present in the batch are rewritten: their current row
    * is re-opened as a pseudo-change, compressed together with the
    * batch (so a batch row equal to the current state is a no-op),
    * and re-versioned continuing the key's existing version counter.
    * Batch rows at or before a key's current `valid_from` are late
    * data and are dropped (documented restriction — out-of-order
    * repair needs a full rebuild). Change timestamps must be unique
    * per key within the combined (current ∪ batch) slice.
    */
  def merge(dim: DataFrame, batch: DataFrame, key: String, ts: String,
      attrs: Seq[String]): DataFrame = {
    val keys = batch.select(col(key)).distinct()
    val untouched = dim.join(keys, Seq(key), "left_anti")
    untouched.unionByName(mergeSlice(dim, batch, key, ts, attrs))
  }

  /** The full post-merge state of ONLY the batch's keys (closed
    * history rows carried through + the rebuilt current intervals) —
    * the rows a key-granular upsert writes, so a streaming SCD2 load
    * rewrites O(batch keys), never the whole dimension (see
    * [[graft.streaming.DeltaSink.scd2Writer]]).
    */
  def mergeSlice(dim: DataFrame, batch: DataFrame, key: String,
      ts: String, attrs: Seq[String]): DataFrame = {
    val keys = batch.select(col(key)).distinct()
    val affectedCurrent = dim.join(keys, Seq(key), "left_semi")
      .filter(col("is_current"))
    // the current row re-opened as a change record at its valid_from
    val currentAsChange = affectedCurrent.select(
      Seq(col(key), col("valid_from").as(ts)) ++ attrs.map(col): _*)
    val lateBound = affectedCurrent
      .select(col(key), col("valid_from").as("__cur_from"))
    val freshBatch = batch
      .join(lateBound, Seq(key), "left")
      .filter(col("__cur_from").isNull || col(ts) > col("__cur_from"))
      .select(Seq(col(key), col(ts)) ++ attrs.map(col): _*)
    val rebuilt0 = build(currentAsChange.unionByName(freshBatch),
      key, ts, attrs)
    // continue each key's version counter (1 for brand-new keys):
    // the rebuilt slice's first row IS the old current row, so its
    // rebuilt version 1 maps back to the old version number
    val baseVersions = affectedCurrent
      .select(col(key), col("version").as("__base_version"))
    val rebuilt = rebuilt0
      .join(baseVersions, Seq(key), "left")
      .withColumn("version",
        col("version") + coalesce(col("__base_version"), lit(1L)) - 1L)
      .drop("__base_version")
    val closedHistory = dim.join(keys, Seq(key), "left_semi")
      .filter(!col("is_current"))
    closedHistory
      .unionByName(rebuilt.select(dim.columns.toIndexedSeq.map(col): _*))
  }
}
