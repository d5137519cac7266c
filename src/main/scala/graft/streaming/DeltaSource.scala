package graft.streaming

import graft.etl.DeltaLite
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Offset = committed table version (the natural exactly-once cursor:
  * versions are dense, monotone, and atomic-published).
  */
case class VersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** DeltaLite table as a STREAMING SOURCE: each micro-batch delivers the
  * data files of append commits in `(lastOffset, latestVersion]` —
  * `readStream.format("graft.streaming.DeltaSourceProvider")
  * .option("path", root).load()`. This closes the lakehouse loop the
  * reference schedules as recurring jobs (ETL_pipeline_countries.py:
  * 144-147): upstream loads append to a table, downstream streams FROM
  * it into aggregates/dimensions via [[DeltaSink]] — table-to-table
  * pipelines with exactly-once on both edges.
  *
  * Semantics (same contract as Delta's own streaming source):
  *  - the offset is the committed VERSION, checkpointed by the engine,
  *    so a restarted query resumes exactly after the last delivered
  *    commit — no replays, no gaps (spec'd across restarts);
  *  - non-append commits cannot be expressed as an append tail; they
  *    fail the batch unless `.option("ignoreChanges", "true")`;
  *  - each batch reads only the NEW files — O(new data), never a
  *    table rescan, so a 100 TB table tails at the cost of its delta.
  */
class DeltaLiteSource(spark: SparkSession, root: String,
    ignoreChanges: Boolean, maxVersionsPerBatch: Option[Int] = None,
    metadataPath: Option[String] = None,
    changeFeed: Boolean = false,
    startingVersion: Option[String] = None,
    ignoreDeletes: Boolean = false) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{ReadLimit,
    Offset => ConnectorOffset}

  private val table = DeltaLite(spark, root)

  // Delta's `startingVersion` stream option: skip history and tail
  // from version n inclusive ("latest" = only commits AFTER stream
  // start). A checkpoint/persisted high-water mark always wins — the
  // floor only seeds a FRESH stream.
  private val startFloor: Long = startingVersion match {
    case Some(v) if v.equalsIgnoreCase("latest") =>
      table.latestVersion.map(_.toLong).getOrElse(-1L)
    case Some(v) => v.toLong - 1
    case None => -1L
  }

  // ---- admission control (the DSv2 rate-limit/AvailableNow API) ----
  // Implementing SupportsAdmissionControl moves offset proposal from
  // getOffset to latestOffset(start, limit): the engine hands us the
  // true start offset, so the capped climb can never regress across a
  // restart by construction. Trigger.AvailableNow then pins a fixed
  // end at prepare time and the backfill drains to it in bounded
  // micro-batches before the query self-terminates — the
  // scheduled-catch-up execution mode of a nightly lakehouse job.

  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(table.latestVersion.map(_.toLong).getOrElse(-1L))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(startOffset: ConnectorOffset,
      limit: ReadLimit): ConnectorOffset = {
    val tableLatest = table.latestVersion.map(_.toLong)
      .getOrElse(return null)
    val latest = availableNowCap.fold(tableLatest)(math.min(_, tableLatest))
    val start: Long = Option(startOffset).map {
      case VersionOffset(v) => v
      case o => o.json().trim.toLong
    }.orElse(delivered).getOrElse(startFloor)
    val capped = maxVersionsPerBatch match {
      case Some(max) => math.min(latest, start + max)
      case None => latest
    }
    VersionOffset(math.max(capped, start))
  }

  private def hwmPath = metadataPath.map(p =>
    new org.apache.hadoop.fs.Path(p, "graft-hwm"))
  private def hwmFs(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // High-water mark of what the engine has already been HANDED (not
  // necessarily committed — getBatch runs before the engine commits,
  // so hwm ≥ committed always). Persisted under the source's
  // checkpoint metadataPath (the FileStreamSource pattern): after a
  // clean restart getOffset MUST NOT propose an offset below the
  // committed one — the engine would log the regressed offset and the
  // next capped climb would re-deliver versions, breaking
  // exactly-once. With the persisted mark, rate limiting stays safe
  // across restarts; without a metadataPath (direct construction) the
  // first post-restart batch is simply uncapped.
  @volatile private var delivered: Option[Long] = {
    hwmPath.flatMap { p =>
      val fs = hwmFs(p)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        body.trim.toLongOption
      }
    }
  }

  private def persistHwm(v: Long): Unit = hwmPath.foreach { p =>
    val fs = hwmFs(p)
    val tmp = new org.apache.hadoop.fs.Path(p.getParent, ".graft-hwm.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p)) sys.error(s"hwm rename failed at $p")
  }

  override val schema: StructType = {
    val base = table.schema.getOrElse(
      sys.error(s"DeltaLite streaming source needs an existing table at $root"))
    if (changeFeed) DeltaLiteSource.withChangeColumns(base) else base
  }

  // column-mapping state captured WITH the schema: data files carry
  // stable physical names, so batches decode physically and alias back
  // to the names this source declared. A rename mid-stream is a
  // non-append commit — the guard fails the batch (stale declared
  // schema, Delta's behavior); with ignoreChanges the stream keeps
  // serving the captured names (the stable ids still resolve).
  private val mapping: Map[String, String] = table.columnMapping
  private val tableSchema: StructType = table.schema.get

  override def getOffset: Option[Offset] =
    table.latestVersion.map { latest =>
      val capped = (maxVersionsPerBatch, delivered) match {
        case (Some(max), Some(last)) => math.min(latest.toLong, last + max)
        case (Some(max), None) => math.min(latest.toLong, startFloor + max)
        case _ => latest.toLong
      }
      VersionOffset(capped)
    }

  private def version(o: Offset): Long = o match {
    case VersionOffset(v) => v
    // checkpoint restore hands back a SerializedOffset; json is just
    // the version number
    case other => other.json().toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(version).getOrElse(startFloor)
    val endV = math.max(version(end), from) // never regress the cursor
    if (!delivered.exists(_ >= endV)) {
      delivered = Some(endV)
      persistHwm(endV)
    }
    val batch =
      if (changeFeed) {
        // CDF tail: row-level changes of the new commits — inserts from
        // appends, deletes with full row content materialized from the
        // deletion vectors; `ignoreChanges` here skips row-preserving
        // rewrite commits (compact/optimize) the way Delta's CDF
        // ignores non-CDC maintenance
        if (from >= version(end))
          spark.createDataFrame(
            java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
        else table.changesBetween(from.toInt, version(end).toInt,
          skipRewrites = ignoreChanges)
          .select(schema.fieldNames.map(org.apache.spark.sql.functions.col)
            .toIndexedSeq: _*)
      } else {
        // a rename/drop since this source captured its schema makes
        // the declared names stale — fail like Delta does on schema
        // change (restart re-captures); ignoreChanges keeps serving
        // the captured names, which the stable physical ids still
        // resolve (files keep every physical column after a drop)
        if (!ignoreChanges && table.columnMapping != mapping)
          sys.error(s"DeltaLite streaming source at $root: columns were " +
            "renamed or dropped after the stream started; restart the " +
            "query to pick up the new schema, or pass ignoreChanges=true " +
            "to keep serving the captured one")
        // decoded in DeltaLite: the captured schema/mapping resolve
        // stable physical ids, and a partitioned Delta adoption's
        // byte-less v0 commit streams with its partition columns
        // INJECTED from the log (no compact() prerequisite)
        table.readAppendsBetween(from, version(end), ignoreChanges,
          ignoreDeletes, tableSchema, mapping)
      }
    Bridge.streamingDataFrame(spark, batch.queryExecution.toRdd, schema)
  }

  override def stop(): Unit = ()
}

object DeltaLiteSource {
  /** CDF schema = table schema + Delta's change-feed columns. */
  private[streaming] def withChangeColumns(base: StructType): StructType =
    StructType(base.fields :+
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false) :+
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.IntegerType, nullable = false))
}

/** The `delta-lite` data source, registered for BOTH surfaces a
  * path-based Delta user reaches for:
  *
  *  - V1 streaming ([[StreamSourceProvider]]):
  *    `spark.readStream.format("delta-lite").option("path", root)` —
  *    options `path`, `ignoreChanges`, `maxVersionsPerBatch`,
  *    `readChangeFeed`.
  *  - DSv2 batch ([[org.apache.spark.sql.connector.catalog.TableProvider]]):
  *    `spark.read.format("delta-lite").load(root)` (reader options
  *    `versionAsOf` / `timestampAsOf` / `readChangeFeed` +
  *    `startingVersion`/`endingVersion` keep their Delta meaning —
  *    the read substitutes to the skipping-index scan exactly like a
  *    catalog table's), and
  *    `df.write.format("delta-lite").mode("append"|"overwrite")
  *    .save(root)` — the first append CREATES the table (the
  *    DataFrame's schema becomes the table schema);
  *    `writeStream.format("delta-lite")` reaches [[GraftTable]]'s
  *    per-epoch txn streaming write.
  *
  * `DataStreamReader.load` prefers the DSv2 table only when it
  * declares MICRO_BATCH_READ; [[graft.catalog.GraftTable]] does not,
  * so streaming reads keep resolving through the V1 source above —
  * one short name, zero ambiguity.
  */
class DeltaSourceProvider extends StreamSourceProvider with DataSourceRegister
    with org.apache.spark.sql.connector.catalog.TableProvider {

  override def shortName(): String = "delta-lite"

  private def pathOf(m: java.util.Map[String, String]): String = {
    // "path" from load()/save(); "location" when the SESSION catalog
    // resolves a `CREATE TABLE … USING delta-lite` entry (managed
    // tables get the metastore's default location)
    val p = Option(m.get("path")).orElse(Option(m.get("location")))
      .map(_.trim).filter(_.nonEmpty)
    p.map(raw => if (raw.startsWith("file:")) new java.net.URI(raw).getPath
      else raw)
      .getOrElse(sys.error(
        "delta-lite needs a single path: .load(<table root>) / .save(<root>)"))
  }

  // the writing DataFrame's schema arrives via getTable (external
  // metadata), so a first write can create the table
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : StructType = {
    val path = pathOf(options)
    DeltaLite(SparkSession.active, path).schema.getOrElse(sys.error(
      s"no DeltaLite table at $path — write one first " +
        "(df.write.format(\"delta-lite\").mode(\"append\").save(path))"))
  }

  override def getTable(schema: StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.Table = {
    val path = pathOf(properties)
    // `.partitionBy("p")` arrives as identity transforms; they only
    // BIND at table creation (an existing log's partition spec always
    // wins — DeltaLite refuses a silent flip on later writes)
    val parts = partitioning.toSeq.map { t =>
      if (t.name != "identity") sys.error(
        s"delta-lite supports identity partitioning only, got $t")
      t.references()(0).fieldNames().mkString(".")
    }
    new graft.catalog.GraftTable(s"delta-lite.`$path`",
      new DeltaLite(SparkSession.active, path, partitionBy = parts),
      externalSchema = Option(schema),
      mergeIncoming = Option(properties.get("mergeSchema"))
        .exists(_.trim.equalsIgnoreCase("true")))
  }

  private def root(params: Map[String, String]): String =
    params.getOrElse("path",
      sys.error("delta-lite source requires .option(\"path\", <table root>)"))

  private def cdf(params: Map[String, String]): Boolean =
    params.get("readChangeFeed").exists(_.toBoolean)

  override def sourceSchema(ctx: SQLContext, schemaOpt: Option[StructType],
      providerName: String, params: Map[String, String]): (String, StructType) = {
    val t = DeltaLite(ctx.sparkSession, root(params))
    val base = schemaOpt.orElse(t.schema).getOrElse(
      sys.error(s"empty DeltaLite table at ${root(params)}"))
    (shortName(),
      if (cdf(params)) DeltaLiteSource.withChangeColumns(base) else base)
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schemaOpt: Option[StructType], providerName: String,
      params: Map[String, String]): Source =
    new DeltaLiteSource(ctx.sparkSession, root(params),
      params.get("ignoreChanges").exists(_.toBoolean),
      params.get("maxVersionsPerBatch").map(_.toInt),
      Some(metadataPath),
      changeFeed = cdf(params),
      startingVersion = params.get("startingVersion"),
      ignoreDeletes = params.get("ignoreDeletes").exists(_.toBoolean))
}
