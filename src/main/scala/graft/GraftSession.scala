package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration, plus the
  * analyst-facing SQL catalog surface: the reference's users query
  * Delta tables by name from a SQL warehouse
  * (/root/reference/README.md "Using Delta Tables for Queries"); Graft
  * re-expresses that as temp views over the testdata star schema plus
  * the graft_* SQL functions, so `spark.sql("SELECT … FROM lineitem")`
  * works end-to-end on any session.
  *
  * Local testing runs `local[N]` in one JVM; on a real cluster the same
  * configs apply per-executor. AQE is on so skewed shuffles re-plan at
  * runtime; shuffle partitions match local cores (the driver contract
  * passes cpus explicitly for Verify/Bench).
  */
object GraftSession {
  def local(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.catalog.graft",
        classOf[graft.catalog.GraftCatalog].getName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Configs any externally-created session should also apply (Verify /
    * Bench build their own sessions per the driver contract).
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark
  }

  val TableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register every testdata table as a temp view (events with the
    * nanos→micros ts conversion applied, like Tables.events) and the
    * graft_* SQL functions. Idempotent; returns the session for
    * chaining.
    */
  def withTables(spark: SparkSession, dir: String): SparkSession = {
    TableNames.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case n => Tables.table(spark, dir, n).createOrReplaceTempView(n)
    }
    GraftExtensions.registerFunctions(spark)
    spark
  }
}
