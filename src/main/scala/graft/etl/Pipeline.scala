package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets

/** The reference's end-to-end job shape
  * (/root/reference/ETL_pipeline_countries.py:144-147):
  * extract (API → raw payload) → land (raw zone) → transform
  * (flatten/tag/cast) → load (dedup-append into the versioned table).
  *
  * `extract` is injected so the pipeline is testable offline and the
  * engine stays free of network dependencies; in production it would
  * wrap the real API client. Landing goes through the Hadoop FS API
  * (HDFS/S3A/local all work). Everything downstream of the raw file is
  * a Spark plan.
  */
final class Pipeline(
    spark: SparkSession,
    extract: () => String,
    rawDir: String,
    transform: DataFrame => DataFrame,
    table: DeltaLite,
    dedupKey: String) {

  /** Land the raw payload; returns the landed path. */
  def land(fileName: String): String = {
    val p = new Path(rawDir, s"$fileName.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(extract().getBytes(StandardCharsets.UTF_8))
    finally out.close()
    p.toString
  }

  /** One scheduled run: extract → land → transform → dedup-append.
    * Returns (landed path, committed version).
    */
  def run(fileName: String): (String, Int) = {
    val landed = land(fileName)
    val df = transform(JsonIngest.readMultiline(spark, landed))
    val version = table.dedupAppend(df, dedupKey)
    (landed, version)
  }
}

/** Deterministic stand-in for the reference's random-country keyword
  * pick (/root/reference/countries.py). Codes/names come from the JDK's
  * ISO-3166 locale data rather than a hard-coded list.
  */
object Countries {
  import java.util.Locale

  lazy val all: Seq[(String, String)] =
    Locale.getISOCountries.toSeq.sorted.map { code =>
      code -> new Locale("", code).getDisplayCountry(Locale.ENGLISH)
    }

  /** Seeded pick — reproducible runs instead of `random.choice`. */
  def pick(seed: Long): (String, String) = {
    val r = new scala.util.Random(seed)
    all(r.nextInt(all.size))
  }
}
