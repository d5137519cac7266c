package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed access to the testdata star schema (see TESTDATA.md).
  *
  * All loads are plain parquet scans — filters/projections applied by
  * callers are pushed into the scan by Catalyst (asserted in specs).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** The generator has shipped `events.ts` as both parquet
    * TIMESTAMP(NANOS) (which Spark only reads as long, via
    * `nanosAsLong`) and plain TIMESTAMP-micros, so dispatch on the
    * dtype actually present: a long is nanos and gets truncated to
    * micros with integer division (the same truncation DuckDB
    * applies; `div` keeps the math in long — a double round trip
    * would lose precision above 2^53 ns), while native timestamp
    * types pass through untouched.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // normalize to TIMESTAMP: watermarks/unix_micros/stream joins
        // all expect it, and under the pinned-UTC session the cast is
        // a value-exact reinterpretation
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw // TimestampType: already micros
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
