package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic-data generator for the SCALE CURVE
  * (SURVEY §19 round-11 item 7): the driver's testdata tops out at
  * sf0.1, so super-linear terms in the heavy-tail operators have no
  * measured scaling point. This main regenerates the same table
  * family — schemas, key ranges, category mixes, duplicate plants and
  * cluster structure mirroring `/root/testdata/sf0.1` — at any scale,
  * purely from hash-derived pseudo-randoms (`xxhash64(seed, id, …)`),
  * so the data is row-order-independent and bit-reproducible.
  *
  * Ratios are quoted WITHIN this generator's family (its own 0.1 vs
  * 1.0 output) — cross-family times vs the driver's sf0.1 serve only
  * as a calibration check, not a ratio operand.
  *
  * Usage: `runMain graft.GenData <outDir> <scale>` — scale 1.0 writes
  * the sf1 sizes (6M lineitem, 50k documents, 20k embeddings, 1M
  * events), 0.1 the calibration twin.
  */
object GenData {

  private val Vocab = Seq("batch", "part", "spark", "line", "column",
    "order", "small", "sort", "fast", "value", "scan", "a", "hash",
    "slow", "group", "agg", "filter", "query", "big", "key", "window",
    "row", "table", "stream", "merge", "data", "vector", "join",
    "shuffle", "cache", "plan")

  private def h(salt: Int, cols: org.apache.spark.sql.Column*)
      : org.apache.spark.sql.Column =
    xxhash64((lit(salt) +: cols): _*)

  /** Uniform [0, n) long from a hash. */
  private def hmod(salt: Int, n: Long,
      cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    pmod(h(salt, cols: _*), lit(n))

  /** Uniform [0, 1) double from a hash. */
  private def huni(salt: Int,
      cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    hmod(salt, 1000000L, cols: _*).cast("double") / lit(1000000.0)

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: GenData <outDir> <scale>")
    val out = args(0)
    val scale = args(1).toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def n(base: Long): Long = math.max(1L, (base * scale).toLong)
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[gendata] $name done")
    }

    // fixed dims
    write(spark.range(5).select(col("id").cast("int").as("r_regionkey"),
      element_at(array(Seq("AFRICA", "AMERICA", "ASIA", "EUROPE",
        "MIDDLE EAST").map(lit): _*), col("id").cast("int") + 1)
        .as("r_name")), "region")
    write(spark.range(25).select(col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      pmod(col("id"), lit(5)).cast("int").as("n_regionkey")), "nation")

    val nCust = n(150000); val nSupp = n(10000); val nPart = n(200000)
    val nOrders = n(1500000); val nDocs = n(50000)
    val nEmb = n(20000); val nEvents = n(1000000); val nUsers = n(15000)

    write(spark.range(nCust).select(col("id").as("c_custkey"),
      concat(lit("Customer#"), lpad(col("id"), 9, "0")).as("c_name"),
      hmod(1, 25, col("id")).cast("int").as("c_nationkey"),
      round(huni(2, col("id")) * 10000, 2).as("c_acctbal"),
      element_at(array(Seq("FURNITURE", "MACHINERY", "AUTOMOBILE",
        "BUILDING", "HOUSEHOLD").map(lit): _*),
        (hmod(3, 5, col("id")) + 1).cast("int")).as("c_mktsegment")),
      "customer")

    write(spark.range(nSupp).select(col("id").as("s_suppkey"),
      concat(lit("Supplier#"), lpad(col("id"), 9, "0")).as("s_name"),
      hmod(4, 25, col("id")).cast("int").as("s_nationkey"),
      round(huni(5, col("id")) * 10000, 2).as("s_acctbal")), "supplier")

    write(spark.range(nPart).select(col("id").as("p_partkey"),
      concat_ws(" ",
        element_at(array(Seq("large", "hot", "small", "cold", "shiny",
          "matte", "light", "heavy").map(lit): _*),
          (hmod(6, 8, col("id")) + 1).cast("int")),
        element_at(array(Seq("ring", "bolt", "nut", "gear", "plate",
          "rod", "clip", "pin").map(lit): _*),
          (hmod(7, 8, col("id")) + 1).cast("int"))).as("p_name"),
      concat(lit("Brand#"), hmod(8, 25, col("id"))).as("p_brand"),
      element_at(array(Seq("LARGE", "ECONOMY", "STANDARD", "SMALL",
        "PROMO").map(lit): _*),
        (hmod(9, 5, col("id")) + 1).cast("int")).as("p_type"),
      (hmod(10, 50, col("id")) + 1).cast("int").as("p_size"),
      round(lit(900.0) + col("id") * 0.1, 2).as("p_retailprice")), "part")

    val orders = spark.range(nOrders).select(col("id").as("o_orderkey"),
      hmod(11, nCust, col("id")).as("o_custkey"),
      element_at(array(Seq("F", "P", "O").map(lit): _*),
        (hmod(12, 3, col("id")) + 1).cast("int")).as("o_orderstatus"),
      round(lit(1000.0) + huni(13, col("id")) * 499000, 2)
        .as("o_totalprice"),
      (lit("1995-01-01").cast("timestamp") +
        make_dt_interval(hmod(14, 2404, col("id")))).as("o_orderdate"),
      element_at(array(Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW").map(lit): _*),
        (hmod(15, 5, col("id")) + 1).cast("int")).as("o_orderpriority"))
    write(orders, "orders")

    // lineitem: 1..7 lines per order (mean ≈ 4) via a hash-sized explode
    val li = spark.range(nOrders)
      .select(col("id").as("l_orderkey"),
        explode(sequence(lit(1),
          (hmod(16, 7, col("id")) + 1).cast("int"))).as("l_linenumber"))
      .select(col("l_orderkey"),
        hmod(17, nPart, col("l_orderkey"), col("l_linenumber")).as("l_partkey"),
        hmod(18, nSupp, col("l_orderkey"), col("l_linenumber")).as("l_suppkey"),
        col("l_linenumber"),
        (hmod(19, 50, col("l_orderkey"), col("l_linenumber")) + 1)
          .cast("double").as("l_quantity"),
        round((hmod(19, 50, col("l_orderkey"), col("l_linenumber")) + 1) *
          (lit(900.0) + hmod(17, nPart, col("l_orderkey"),
            col("l_linenumber")) * 0.1) / 10, 2).as("l_extendedprice"),
        (hmod(20, 11, col("l_orderkey"), col("l_linenumber")).cast("double")
          / 100.0).as("l_discount"),
        (hmod(21, 9, col("l_orderkey"), col("l_linenumber")).cast("double")
          / 100.0).as("l_tax"),
        element_at(array(Seq("A", "N", "R").map(lit): _*),
          (hmod(22, 3, col("l_orderkey"), col("l_linenumber")) + 1)
            .cast("int")).as("l_returnflag"),
        element_at(array(Seq("F", "O").map(lit): _*),
          (hmod(23, 2, col("l_orderkey"), col("l_linenumber")) + 1)
            .cast("int")).as("l_linestatus"),
        (lit("1995-01-01").cast("timestamp") + make_dt_interval(
          hmod(14, 2404, col("l_orderkey")) +
            hmod(24, 120, col("l_orderkey"), col("l_linenumber")) + 1))
          .as("l_shipdate"))
    write(li, "lineitem")

    // documents: hash-vocab texts, 8..110 words; ~0.3% of docs are
    // EXACT duplicates of an earlier doc and ~0.5% near-duplicates
    // (one word appended) — the sf0.1 plant rates
    val vocabCol = array(Vocab.map(lit): _*)
    def textOf(seed: org.apache.spark.sql.Column) = array_join(
      transform(sequence(lit(0),
        (hmod(25, 103, seed) + 7).cast("int")),
        i => element_at(vocabCol,
          (hmod(26, Vocab.size.toLong, seed, i) + 1).cast("int"))), " ")
    // duplicate SOURCES are restricted to ids < 1000 — those always
    // take the otherwise branch, so their stored text IS textOf(id);
    // an id-relative source (id-500) could itself be a plant whose
    // stored text differs, silently shaving the stated plant rates
    val baseDoc = spark.range(nDocs).select(col("id").as("doc_id"),
      when(col("id") >= 1000 && hmod(27, 312, col("id")) === 0,
        textOf(hmod(90, 1000, col("id")))) // exact duplicate of an early doc
        .when(col("id") >= 1000 && hmod(28, 200, col("id")) === 0,
          concat(textOf(hmod(91, 1000, col("id"))), lit(" extra"))) // near-dup
        .otherwise(textOf(col("id"))).as("text"),
      element_at(array(Seq("en", "en", "en", "en", "de", "zh", "fr",
        "es").map(lit): _*), (hmod(29, 8, col("id")) + 1).cast("int"))
        .as("lang"),
      concat(lit("src"), hmod(30, 20, col("id"))).as("source"))
    write(baseDoc.withColumn("n_chars", length(col("text"))), "documents")

    // embeddings: 10 hash-derived centroids in 64-dim plus per-vector
    // noise of the SAME magnitude as the centroid — intra-cluster
    // cosine lands near 0.5 (clusters stay clearly separable for
    // IVF/semdedup cell assignment: inter-cluster ≈ 0) while staying
    // FAR below the 0.95 near-dup threshold, so the only pairs the
    // dedup/near-pair keys find are the ones their queries PLANT.
    // This calibrates the family's near-pair density to the driver's
    // (whose base corpus contributes ~zero ≥0.95 pairs); the earlier
    // ±0.25 noise put intra-cluster cosine at ~0.94 and made the
    // output-bound keys' answers ~5000x denser than the gate's.
    write(spark.range(nEmb).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        ((hmod(31, 2000, pmod(col("id"), lit(10)), i).cast("double")
          / 1000.0 - 1.0) +
          (hmod(32, 2000, col("id"), i).cast("double") / 1000.0 - 1.0))
          .cast("float")).as("embedding"),
      pmod(col("id"), lit(10)).cast("int").as("label")), "embeddings")

    // events: 30 days, uniform users/types, json props
    write(spark.range(nEvents).select(col("id").as("event_id"),
      (lit("2024-01-01").cast("timestamp") + make_dt_interval(
        lit(0), lit(0), lit(0),
        hmod(33, 2592000L, col("id")).cast("double"))).as("ts"),
      hmod(34, nUsers, col("id")).as("user_id"),
      element_at(array(Seq("click", "view", "purchase", "signup",
        "error").map(lit): _*), (hmod(35, 5, col("id")) + 1).cast("int"))
        .as("event_type"),
      round(huni(36, col("id")) * 100, 3).as("value"),
      concat(lit("{\"k\": "), hmod(37, 100, col("id")), lit("}"))
        .as("props")), "events")

    spark.stop()
    println(s"[gendata] complete: $out at scale $scale")
  }
}
