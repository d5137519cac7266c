package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §3). The reference lands multiline
  * JSON and serves queries from parquet-backed tables; Graft exposes the
  * same formats plus the write-side layout controls that matter at
  * 100 TB: partitioned directories for pruning and bucketed tables for
  * shuffle-free joins.
  */
object Sources {

  /** Parquet read with an enforced schema (skips footer inference and
    * fails loudly on drift — the scan still prunes columns/filters).
    */
  def parquet(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame =
    schema.fold(spark.read.parquet(path))(s =>
      spark.read.schema(s).parquet(path))

  /** Multiline ("pretty-printed API response") JSON, as the reference
    * ingests; schema optional to skip the expensive inference pass.
    */
  def multilineJson(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("multiline", "true")
    schema.fold(r.json(path))(s => r.schema(s).json(path))
  }

  /** Line-delimited JSON — the streaming/scale-friendly JSON layout
    * (splittable, unlike multiline).
    */
  def jsonLines(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r.json(path))(s => r.schema(s).json(path))
  }

  def csv(spark: SparkSession, path: String, header: Boolean = true,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", header.toString)
    schema.fold(r.option("inferSchema", "true").csv(path))(s =>
      r.schema(s).csv(path))
  }

  /** ORC — the other columnar lake format Spark reads natively
    * (predicate pushdown + column pruning work the same as parquet).
    */
  def orc(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame =
    schema.fold(spark.read.orc(path))(s => spark.read.schema(s).orc(path))

  def writeOrc(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** Raw text: one row per line (`value` column) — the entry format
    * for unstructured corpora before any parsing.
    */
  def textLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Fault-tolerant line-JSON ingest: malformed lines don't kill the
    * load (a 100 TB crawl ALWAYS has some) — they surface whole in the
    * `_corrupt_record` column with every data field null, so the
    * caller splits good rows from a quarantine (pair with
    * [[graft.ops.Expectations]] for the metrics). PERMISSIVE is
    * Spark's default mode; declaring the corrupt column in the schema
    * is what makes the bad rows observable instead of silently null.
    */
  def jsonLinesPermissive(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
  }

  /** (parsed rows, quarantine rows) from a permissive JSON read. Spark
    * rejects queries whose only referenced column is the internal
    * corrupt-record column unless the parsed batch is materialized
    * first, so the split caches the underlying read. The cache is
    * registered with the engine's shared release hook — call
    * `graft.ops.Dedup.releaseCaches()` once both halves are consumed
    * (an `.unpersist()` on the returned halves would be a no-op: they
    * are derived plans, not the cached parent).
    */
  def jsonLinesQuarantine(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val df = graft.ops.Dedup.tracked(
      jsonLinesPermissive(spark, path, schema)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    (df.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      df.filter(col("_corrupt_record").isNotNull))
  }

  /** Hive-style partitioned parquet: directory per partition value →
    * partition pruning turns predicate-on-partition-col queries into
    * partial scans. Keep partition cardinality bounded (a date or a
    * small enum, not a user id).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted table: joins/aggregations on the bucket key
    * skip the shuffle entirely when both sides share the layout.
    * (Bucketing requires saveAsTable — path-only parquet has no bucket
    * metadata.) `path` makes it an EXTERNAL table at that location
    * (managed-in-warehouse otherwise). The pre-repartition on the
    * bucket column uses the same murmur3 hash as the bucket spec, so
    * each write task holds exactly one bucket → ONE file per bucket,
    * which keeps the per-bucket sort usable at read (many files per
    * bucket would force a merge sort back into the plan).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, mode: SaveMode = SaveMode.Overwrite,
      path: Option[String] = None): Unit = {
    val w = df.repartition(buckets, df(bucketCol)).write.mode(mode)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
    path.fold(w.saveAsTable(table)) { p =>
      w.option("path", p).saveAsTable(table)
    }
  }
}
