package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

import java.nio.charset.StandardCharsets

/** A minimal versioned table format with the Delta-table properties the
  * reference relies on (/root/reference/README.md:237-248): atomic
  * committed versions, schema enforcement, time travel, and
  * dedup-on-append — on plain parquet + a JSON commit log.
  *
  * Layout: `<root>/v=<n>/part-*.parquet` snapshot-data per commit and
  * `<root>/_log/<n>.json` commit records. A commit is visible only once
  * its log file exists; the log file is written via temp-file + atomic
  * rename, so concurrent readers never see a half commit (single-writer
  * like the reference's scheduled job). All IO goes through the Hadoop
  * FileSystem API, so the same code addresses HDFS/S3A/local.
  *
  * Reads replay the log: `append` commits add their files to the
  * snapshot, `overwrite` commits reset it. Time travel = replay up to
  * the requested version.
  */
class DeltaLite(spark: SparkSession, root: String) {
  private val rootPath = new Path(root)
  private val logDir = new Path(rootPath, "_log")
  private def fs: FileSystem =
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private case class Commit(version: Int, mode: String, dir: String,
      schemaJson: String)

  private def commits(): Seq[Commit] = {
    if (!fs.exists(logDir)) return Nil
    fs.listStatus(logDir).toSeq
      .filter(_.getPath.getName.endsWith(".json"))
      .map { st =>
        val in = fs.open(st.getPath)
        val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        parseCommit(body)
      }
      .sortBy(_.version)
  }

  // hand-rolled (de)serialization — the commit record is 4 flat fields
  private def parseCommit(json: String): Commit = {
    def field(k: String): String = {
      val m = ("\"" + k + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
      m.findFirstMatchIn(json)
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
        .getOrElse(sys.error(s"corrupt commit: missing $k in $json"))
    }
    Commit(field("version").toInt, field("mode"), field("dir"), field("schema"))
  }

  private def renderCommit(c: Commit): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"version":"${c.version}","mode":"${c.mode}","dir":"${esc(c.dir)}","schema":"${esc(c.schemaJson)}"}"""
  }

  def latestVersion: Option[Int] = commits().lastOption.map(_.version)

  def schema: Option[StructType] = commits().lastOption.map(c =>
    DataType.fromJson(c.schemaJson).asInstanceOf[StructType])

  /** Enforce name+type equality with the committed schema (nullable is
    * not load-bearing for parquet round trips).
    */
  private def enforceSchema(df: DataFrame): Unit = schema.foreach { committed =>
    val a = committed.fields.map(f => (f.name, f.dataType)).toSeq
    val b = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    require(a == b,
      s"schema mismatch: table has ${a.mkString(",")} but batch has ${b.mkString(",")}")
  }

  private def commit(df: DataFrame, mode: String): Int = {
    val version = latestVersion.map(_ + 1).getOrElse(0)
    val dataDir = new Path(rootPath, s"v=$version")
    df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir.toString)
    val record = Commit(version, mode, dataDir.toString, df.schema.json)
    val tmp = new Path(logDir, s".$version.json.tmp")
    val fin = new Path(logDir, s"$version.json")
    val out = fs.create(tmp, true)
    try out.write(renderCommit(record).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, fin)) sys.error(s"commit rename failed for v$version")
    version
  }

  /** Append a batch (schema-enforced). Returns the committed version. */
  def append(df: DataFrame): Int = { enforceSchema(df); commit(df, "append") }

  /** Replace table contents (schema may change). */
  def overwrite(df: DataFrame): Int = commit(df, "overwrite")

  /** Append only batch rows whose `key` isn't already present — the
    * reference's dedup-on-append load. No-ops (still commits an empty
    * version) when everything is duplicate.
    */
  def dedupAppend(df: DataFrame, key: String): Int = {
    enforceSchema(df)
    val fresh = if (latestVersion.isDefined)
      DedupAppend.newRows(df, read(), key) else df
    commit(fresh, "append")
  }

  /** Merge/upsert: batch rows replace same-key rows, new keys append —
    * the UPSERT half of a MERGE INTO. One anti-join + an overwrite
    * commit; old versions stay readable via time travel.
    */
  def upsert(df: DataFrame, key: String): Int = {
    enforceSchema(df)
    val merged = if (latestVersion.isDefined)
      read().join(df.select(key), Seq(key), "left_anti").unionByName(df)
    else df
    commit(merged, "overwrite")
  }

  /** Current snapshot. */
  def read(): DataFrame = readAsOf(Int.MaxValue)

  /** Time travel: the snapshot as of `version` (inclusive). */
  def readAsOf(version: Int): DataFrame = {
    val upTo = commits().filter(_.version <= version)
    require(upTo.nonEmpty, s"no commits at or before version $version in $root")
    val live = upTo.foldLeft(Seq.empty[Commit]) {
      case (_, c) if c.mode == "overwrite" => Seq(c)
      case (acc, c) => acc :+ c
    }
    val sch = DataType.fromJson(live.last.schemaJson).asInstanceOf[StructType]
    live.map(c => spark.read.schema(sch).parquet(c.dir)).reduce(_ unionAll _)
  }
}

object DeltaLite {
  def apply(spark: SparkSession, root: String): DeltaLite =
    new DeltaLite(spark, root)
}
