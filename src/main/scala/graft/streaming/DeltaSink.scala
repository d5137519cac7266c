package graft.streaming

import graft.etl.DeltaLite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming load into a [[graft.etl.DeltaLite]] table — the streaming
  * expression of the reference's scheduled incremental job
  * (/root/reference/ETL_pipeline_countries.py:144-147): instead of a
  * cron re-run, each micro-batch lands as one table commit.
  *
  * Exactly-once: Structured Streaming's foreachBatch gives at-least-once
  * delivery (a batch is replayed if the job dies between the write and
  * the checkpoint advance). The writer closes the gap by recording
  * (appId, batchId) in the commit log via [[DeltaLite.txnAppend]] — a
  * replayed batchId is detected against the log and skipped, making the
  * write path idempotent regardless of where the retry interleaves.
  */
object DeltaSink {

  /** The foreachBatch function: idempotent transactional append, with
    * optional dedup-on-append on `dedupKey` (the reference's load
    * semantics). Exposed separately from [[start]] so batch retries can
    * be driven directly in tests.
    */
  def batchWriter(table: DeltaLite, appId: String,
      dedupKey: Option[String] = None): (DataFrame, Long) => Unit =
    (batch, batchId) => table.txnAppend(batch, appId, batchId, dedupKey)

  /** Incrementally-maintained aggregate (a streaming materialized
    * view): each micro-batch's per-key deltas are merged into the
    * table — existing keys accumulate, new keys appear — via the
    * file-granular [[DeltaLite.txnUpsert]], so only files containing
    * batch keys rewrite and a replayed batch cannot double-count.
    * The batch is aggregated BEFORE touching the table: the merge
    * reads/writes O(batch keys), never O(stream history).
    *
    * `aggSpec` maps a raw batch to one row per key with the additive
    * measures; `combine` adds an old and a new measures row (both
    * non-null). Column sets of table and aggSpec output must match.
    */
  def aggregateWriter(table: DeltaLite, appId: String, key: String,
      aggSpec: DataFrame => DataFrame,
      combine: Seq[(String, (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column)])
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    import org.apache.spark.sql.functions._
    if (!table.lastTxn(appId).exists(_ >= batchId)) {
      val delta = aggSpec(batch)
      val merged = if (table.latestVersion.isEmpty) delta
      else {
        val cur = table.read()
        val curKeys = combine.map { case (c, _) => cur(c).as(s"__cur_$c") }
        delta.join(cur.select((col(key) +: curKeys): _*), Seq(key), "left")
          .select(col(key) +: combine.map { case (c, f) =>
            when(col(s"__cur_$c").isNull, col(c))
              .otherwise(f(col(s"__cur_$c"), col(c))).as(c)
          }: _*)
      }
      table.txnUpsert(merged, key, appId, batchId)
      ()
    }
  }

  /** [[batchWriter]] plus table maintenance on a cadence: every
    * `compactEvery` batches the small live files bin-pack into one
    * rewrite commit — the auto-OPTIMIZE half of a production streaming
    * load (a micro-batch stream otherwise accretes one small file per
    * batch forever, and 100k tiny files kill scan planning long before
    * they kill storage). Compaction I/O is O(small files); replayed
    * batches skip the append but a re-compact is harmless (below
    * `minFiles` it's a no-op).
    */
  def compactingWriter(table: DeltaLite, appId: String, compactEvery: Int,
      targetBytes: Long = 128L * 1024 * 1024,
      dedupKey: Option[String] = None): (DataFrame, Long) => Unit = {
    require(compactEvery >= 1, "compactEvery must be >= 1")
    (batch, batchId) => {
      table.txnAppend(batch, appId, batchId, dedupKey)
      if ((batchId + 1) % compactEvery == 0) { table.compact(targetBytes); () }
    }
  }

  /** Streaming SCD2 load: each micro-batch of change rows is merged
    * into a versioned dimension via [[graft.etl.Scd2.mergeSlice]] —
    * only the batch's keys rewrite (file-granular [[DeltaLite
    * .txnUpsert]] on the key), history stays untouched on disk, and
    * the (appId, batchId) transaction makes replays no-ops. The
    * streaming expression of warehouse dimension maintenance: the
    * reference's scheduled merge keeps latest-state only; this keeps
    * every state queryable as-of any time.
    *
    * Batch timestamps must advance per key across batches (late rows
    * are dropped by [[graft.etl.Scd2.merge]]'s contract).
    */
  def scd2Writer(table: DeltaLite, appId: String, key: String,
      ts: String, attrs: Seq[String]): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      if (!table.lastTxn(appId).exists(_ >= batchId)) {
        val slice =
          if (table.latestVersion.isEmpty)
            graft.etl.Scd2.build(batch, key, ts, attrs)
          else
            graft.etl.Scd2.mergeSlice(table.read(), batch, key, ts, attrs)
        table.txnUpsert(slice, key, appId, batchId)
        ()
      }
    }

  /** CDC replication: apply a change-feed micro-batch (rows stamped
    * `_change_type`/`_commit_version`, as the `readChangeFeed` source
    * emits) to a mirror table — inserts upsert, deletes delete, so the
    * mirror tracks the source TABLE STATE including deletions, which a
    * plain append tail cannot express. The batch collapses to the last
    * change per key (highest commit version) before ONE clause
    * [[graft.etl.DeltaLite.txnMerge]] — O(batch keys) file-granular
    * write, replay-guarded by (appId, batchId). Compose with the CDF
    * source for table→mirror pipelines with exactly-once on both
    * edges.
    */
  def cdfApplyWriter(table: DeltaLite, appId: String, key: String)
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    import org.apache.spark.sql.functions._
    if (!table.lastTxn(appId).exists(_ >= batchId) && !batch.isEmpty) {
      val dataCols = batch.columns.filterNot(c =>
        c == "_change_type" || c == "_commit_version")
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col(key))
        .orderBy(col("_commit_version").desc)
      val latest = batch.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      if (table.latestVersion.isEmpty) {
        // bootstrap: an empty mirror has nothing to delete, and the
        // merge path would bake the CDC stamps into the new schema
        table.txnAppend(latest.filter(col("_change_type") === "insert")
          .select(dataCols.map(col).toSeq: _*), appId, batchId)
      } else {
        table.txnMerge(latest, key,
          deleteWhen = Some(col("s._change_type") === "delete"),
          insertWhen = Some(col("s._change_type") =!= "delete"),
          appId = appId, txnId = batchId)
      }
      ()
    }
  }

  /** Start the stream → table load. `checkpoint` carries the source
    * offsets; the table's commit log carries the (appId, batchId)
    * watermark — together they give end-to-end exactly-once.
    */
  def start(stream: DataFrame, table: DeltaLite, appId: String,
      checkpoint: String, dedupKey: Option[String] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch(batchWriter(table, appId, dedupKey))
      .start()
}
