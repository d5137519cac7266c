package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search (SURVEY.md §2e).
  *
  * Vector math is built from `zip_with`/`aggregate` higher-order
  * expressions — codegen'd columnar math, no UDF, so a scan computing a
  * million cosines stays in WholeStageCodegen. Elements are cast to
  * double before multiply so results match any engine doing double
  * arithmetic (floats widen exactly).
  *
  * Tier map: [[bruteForceTopK]] (exact baseline) → sign-LSH /
  * [[buildIvfIndex]] / PQ (coarse scale paths here) → [[Hnsw]]
  * (sharded graph index, the recall-critical final-ranking tier).
  */
object Similarity {

  /** HOF fallback forms — kept for composability with arbitrary array
    * expressions; hot paths use the native expressions below.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Native single-pass cosine (graft.functions.CosineSimilarity) —
    * bit-identical to dot/(norm·norm) with sequential folds.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vector_cosine(a, b)

  /** Deterministic pseudo-random hyperplanes for sign-LSH. */
  private[ops] def planeVectors(planes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val r = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(r.nextGaussian()))
  }

  /** Random-hyperplane LSH bucket id: bit j = sign(v · plane_j). Two
    * vectors at cosine angle θ collide with prob (1 - θ/π)^planes —
    * bucket count tunes recall vs. candidate volume.
    */
  def hyperplaneBucket(vec: Column, planes: Int = 12, seed: Long = 11L,
      dim: Int = 64): Column =
    element_at(hyperplaneTables(vec, planes, 1, seed, dim), 1)

  /** Multi-table LSH: one bucket id per table (each table = `planes`
    * hyperplanes under a salted seed). Candidates are unioned across
    * tables, driving miss probability down exponentially in the table
    * count: P(miss) = (1 - (1-θ/π)^planes)^tables. Native expression —
    * one pass over the vector per (table, plane).
    */
  def hyperplaneTables(vec: Column, planes: Int, tables: Int,
      seed: Long = 11L, dim: Int = 64): Column =
    graft.functions.VectorFunctions.hyperplane_buckets(vec, planes, tables,
      seed, dim)

  /** The PRODUCTION plane-count rule, as API instead of folklore:
    * per-table candidate volume is Σ bucket², and expected bucket size
    * ≈ n / 2^planes on spread data, so planes must grow with
    * log2(corpus) to keep per-bucket pairs bounded —
    * `planes = clamp(ceil(log2(n / targetBucket)), 4, 24)`. With the
    * default target of 64 this reproduces the measured-good settings
    * of the scale curve: ~5 at 2k vectors, 9 at 20k, 10 at 60k
    * (SURVEY §21 knob table: planes 8-10 turned the fixed-knob
    * quadratic into the tamed path). Tightly-clustered vectors still
    * co-bucket regardless of plane count — the remaining candidate
    * volume IS the answer's near-pair structure, which no bucketing
    * can shrink.
    */
  def autoPlanes(corpusCount: Long, targetBucket: Int = 64): Int = {
    require(corpusCount >= 0 && targetBucket >= 1,
      "autoPlanes needs a non-negative count and a positive target")
    val buckets = math.max(1.0, corpusCount.toDouble / targetBucket)
    math.min(24, math.max(4,
      math.ceil(math.log(buckets) / math.log(2.0)).toInt))
  }

  /** Exact brute-force cosine top-k: broadcast the (small) query set,
    * one pass over candidates computing cosine map-side, then rank.
    * The only shuffle is the final per-query top-k (tiny).
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
      vecCol: String, idCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  // ----------------------------------------------------------------- IVF

  /** Train an IVF coarse quantizer: deterministic seeded init + `iters`
    * Lloyd steps over a BOUNDED training slice (standard IVF practice —
    * the quantizer needs a representative sample, not the corpus). The
    * slice is a deterministic hash-threshold sample: one metadata-only
    * `count()` sizes the fraction, then a map-only
    * `pmod(hash(v), M) < frac·M` filter keeps ≈maxTrain rows — no
    * shuffle, no global sort, no driver round trip of the slice (an
    * `orderBy(hash).limit(n)` would fall back to a full sort once n
    * exceeds the top-K threshold). Each Lloyd step aggregates one row
    * per vector through [[graft.functions.VectorSumAgg]] (map-side
    * partials; k×dim doubles per partition cross the wire — NOT the
    * corpus×dim posexplode that would shuffle petabytes at 100 TB). The
    * centroid matrix itself is tiny model state (k × dim) held on the
    * driver, as any learned model is.
    */
  def trainIvfCentroids(corpus: DataFrame, vecCol: String, k: Int = 16,
      iters: Int = 2, maxTrain: Int = 20000): Array[Array[Double]] = {
    import org.apache.spark.storage.StorageLevel
    val vecs = corpus.select(col(vecCol).cast("array<double>").as("v"))
    val n = vecs.count()
    val M = 1000000L
    val keep = if (n <= maxTrain) M
      else math.max(1L, (maxTrain.toDouble / n * M).toLong)
    val sample = vecs
      .filter(pmod(hash(col("v")), lit(M)) < lit(keep))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var centroids = sample
      .orderBy(hash(col("v"))).limit(k)
      .collect().map(_.getSeq[Double](0).toArray)
    for (_ <- 0 until iters) {
      val assigned = sample.select(col("v"),
        element_at(graft.functions.VectorFunctions.nearest_centroids(
          col("v"), centroids, 1), 1).as("cluster"))
      // k rows of (cluster, Σv, n) — the whole reduction is one
      // ObjectHashAggregate, one input row per vector
      val stats = assigned.groupBy("cluster")
        .agg(graft.functions.VectorFunctions.vector_sum(col("v")).as("vsum"),
          count(lit(1)).as("n"))
        .collect()
      val byCluster = stats.map(r => r.getAs[Int]("cluster") ->
        (r.getSeq[Double](1).toArray, r.getAs[Long]("n"))).toMap
      centroids = centroids.indices.map { c =>
        byCluster.get(c) match {
          case Some((s, n)) => s.map(_ / n)
          case None => centroids(c) // empty cluster keeps its centroid
        }
      }.toArray
    }
    sample.unpersist()
    centroids
  }

  /** IVF approximate top-k: corpus rows live in their nearest-centroid
    * cell; queries probe the `nprobe` nearest cells. Candidate volume
    * per query ≈ nprobe/k of the corpus — the inverted-file scale path,
    * complementary to LSH (data-adaptive cells vs oblivious planes).
    */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, vecCol: String,
      idCol: String, k: Int, centroids: Array[Array[Double]],
      nprobe: Int = 3): DataFrame = {
    import graft.functions.VectorFunctions.nearest_centroids
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      element_at(nearest_centroids(col(vecCol), centroids, 1), 1).as("cluster"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      posexplode(nearest_centroids(col(vecCol), centroids, nprobe))
        .as(Seq("probe", "cluster")))
    // rankCandidates scores map-side and drops the vectors before the
    // only shuffle — a candidate appears once per (query, cell) probe,
    // so the dedup semantics are unchanged
    rankCandidates(c.join(broadcast(q), Seq("cluster")), k)
  }

  /** Materialized IVF index: the trained centroid model + the corpus
    * with its cell assignment written once as cell-partitioned parquet.
    * Build once, probe many — probing reads ONLY the nprobe cell
    * directories per query batch (partition pruning on `cluster`),
    * instead of re-assigning the whole corpus per search like the
    * ad-hoc [[ivfTopK]] path does.
    */
  def buildIvfIndex(corpus: DataFrame, vecCol: String, idCol: String,
      path: String, k: Int = 16, iters: Int = 2): Array[Array[Double]] = {
    import graft.functions.VectorFunctions.nearest_centroids
    val centroids = trainIvfCentroids(corpus, vecCol, k, iters)
    corpus.select(col(idCol), col(vecCol),
        element_at(nearest_centroids(col(vecCol), centroids, 1), 1).as("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(s"$path/cells")
    // centroid model: one row per (cluster, dim) — tiny, plain parquet
    val spark = corpus.sparkSession
    import spark.implicits._
    centroids.zipWithIndex
      .flatMap { case (v, c) => v.zipWithIndex.map { case (x, d) => (c, d, x) } }
      .toSeq.toDF("cluster", "dim", "x")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    centroids
  }

  /** Incremental IVF maintenance: assign NEW vectors to the EXISTING
    * cells and append them to the cell-partitioned store — no
    * retraining, no rewrite of the standing index (the daily-ingest
    * path of a materialized vector index: O(new vectors) work however
    * large the index has grown). Probing the appended index is
    * EXACTLY probing an index built whole with the same centroids
    * (spec'd): assignment uses the persisted quantizer, and the
    * hive-partitioned append keeps the `cluster` layout so nprobe
    * partition pruning still holds. Centroids drift from the corpus
    * distribution as appends accumulate (recall, not correctness);
    * rebuild with [[buildIvfIndex]] when cell sizes skew.
    */
  def appendToIvfIndex(spark: SparkSession, newVectors: DataFrame,
      vecCol: String, idCol: String, path: String): Unit = {
    import graft.functions.VectorFunctions.nearest_centroids
    val centroids = loadIvfCentroids(spark, path)
    newVectors.select(col(idCol), col(vecCol),
        element_at(nearest_centroids(col(vecCol), centroids, 1), 1)
          .as("cluster"))
      .write.mode("append").partitionBy("cluster").parquet(s"$path/cells")
  }

  /** Load the centroid model back (k × dim, driver-side model state). */
  def loadIvfCentroids(spark: SparkSession, path: String): Array[Array[Double]] = {
    val rows = spark.read.parquet(s"$path/centroids")
      .collect().map(r => (r.getAs[Int]("cluster"), r.getAs[Int]("dim"),
        r.getAs[Double]("x")))
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, vs) =>
      vs.sortBy(_._2).map(_._3)
    }.toArray
  }

  /** Probe a built index: same semantics as [[ivfTopK]], but candidates
    * come from the cell-partitioned store — the scan plans with
    * PartitionFilters on `cluster`, reading nprobe cells, not the
    * corpus.
    */
  def probeIvfIndex(spark: SparkSession, queries: DataFrame, vecCol: String,
      idCol: String, path: String, k: Int,
      nprobe: Int = 3): DataFrame = {
    import graft.functions.VectorFunctions.nearest_centroids
    val centroids = loadIvfCentroids(spark, path)
    val cells = spark.read.parquet(s"$path/cells")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      posexplode(nearest_centroids(col(vecCol), centroids, nprobe))
        .as(Seq("probe", "cluster")))
    // same map-side-score tail as ivfTopK (see rankCandidates)
    rankCandidates(
      cells.withColumnRenamed(idCol, "neighbor_id")
        .withColumnRenamed(vecCol, "cv")
        .join(broadcast(q), Seq("cluster")), k)
  }

  /** Multi-table LSH approximate top-k: queries probe their bucket in
    * each table; candidates are unioned and deduped before exact
    * scoring. The scale path — per-query candidate volume is
    * tables × bucket size, not the corpus. Recall vs. bruteForceTopK
    * is asserted in specs.
    */
  /** Approximate kNN GRAPH over the whole corpus — every vector's
    * top-k neighbors, the all-to-all companion of [[lshTopK]] (whose
    * broadcast query set cannot be the corpus itself). Both sides of
    * the multi-table LSH bucket SELF-join shuffle on (table, bucket),
    * so per-vector candidate volume stays tables × bucket size — never
    * all-pairs, never a corpus broadcast. The banded table persists
    * once (self-joins would otherwise recompute the signatures twice);
    * release via [[Dedup.releaseCaches]].
    */
  def knnGraph(corpus: DataFrame, vecCol: String, idCol: String, k: Int,
      planes: Int = 5, tables: Int = 6, seed: Long = 11L): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val banded = Dedup.tracked(corpus
      .select(col(idCol).as("__id"), col(vecCol).as("__v"),
        posexplode(hyperplaneTables(col(vecCol), planes, tables, seed))
          .as(Seq("table", "bucket")))
      .persist(StorageLevel.MEMORY_AND_DISK))
    val a = banded.select(col("table"), col("bucket"),
      col("__id").as("query_id"), col("__v").as("qv"))
    val b = banded.select(col("table"), col("bucket"),
      col("__id").as("neighbor_id"), col("__v").as("cv"))
    rankCandidates(a.join(b, Seq("table", "bucket")), k)
  }

  /** Shared tail of the LSH/IVF paths: score exact cosine, keep top-k
    * per query, dedupe (query, neighbor) candidates arriving from
    * multiple tables. Expects columns query_id/qv/neighbor_id/cv.
    *
    * Order of operations is deliberate (guide §2.3 "shuffle fewer
    * bytes"): the cosine is computed MAP-SIDE in the join-output stage
    * and the vector payloads dropped right there, so the only
    * full-candidate-volume exchange (the per-query window) carries
    * (id, id, double) rows, not two dim-sized arrays per row. A pair
    * seen in t tables is scored t times instead of once — a codegen'd
    * dim-length fold per extra occurrence, orders of magnitude cheaper
    * than shuffling its 2×dim doubles. `dense_rank` over
    * (cosine DESC, neighbor_id) equals `row_number` over the DEDUPED
    * candidates: duplicate occurrences tie exactly (same deterministic
    * cosine, same neighbor), distinct neighbors never tie (id
    * tiebreak) — so ranks are identical and the residual
    * dropDuplicates runs on the ≤ k·tables surviving rows per query,
    * not the full candidate volume (one narrow exchange instead of a
    * payload-wide dedup exchange plus a window exchange).
    */
  private def rankCandidates(joined: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    joined
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
      .withColumn("rank", dense_rank().over(w).cast("long"))
      .filter(col("rank") <= k)
      .dropDuplicates("query_id", "neighbor_id")
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** First 60 bits of md5(s) as a non-negative long — the same value
    * DuckDB's `('0x'||substr(md5(s),1,15))::BIGINT` yields; used for
    * the oracle-path plane coefficients. */
  private def md5Long60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  /** md5-derived hyperplane bucket ids — the ORACLE path for sign-LSH
    * (the seeded-Gaussian [[hyperplaneTables]] native expression stays
    * the throughput path, the same fast/oracle split as
    * simhash/minhash): plane coefficient (t, p, d) =
    * md5("t,p,d")[0:60] / 2^60 − 0.5, a symmetric uniform every SQL
    * engine re-derives; bucket bit p of table t = [v · plane > 0],
    * with the dot as the SAME sequential double fold the cosine
    * expressions use — so bits (and therefore buckets, candidates and
    * the final ranking) are bit-identical across engines. Uniform-cube
    * plane directions are a standard sign-LSH family (slightly
    * axis-biased vs Gaussian, immaterial for recall at these plane
    * counts — asserted in SimilaritySpec).
    */
  def md5PlaneBuckets(vec: Column, planes: Int, tables: Int,
      dim: Int = 64): Column = {
    // [table][plane][dim] coefficient matrix, evaluated through the
    // same codegen'd kernel as the Gaussian fast path (an HOF
    // formulation measured ~4x slower); the kernel's sequential
    // dot += v(i) * c(i) is the same fold order the SQL twin's
    // list_sum uses, so bits stay bit-identical
    val matrix = Array.tabulate(tables, planes, dim)((t, p, d) =>
      md5Long60(s"$t,$p,$d") / 1152921504606846976.0 - 0.5)
    graft.functions.VectorFunctions.hyperplane_buckets_with(vec, matrix, dim)
  }

  private def md5Coef(parts: String*): Double =
    md5Long60(parts.mkString(",")) / 1152921504606846976.0 - 0.5

  /** md5-derived IVF coarse centroids — the ORACLE variant of
    * [[trainIvfCentroids]] (the k-means path stays the
    * quality/throughput path, the same fast/oracle split as the LSH
    * planes): centroid (c, d) = md5("ivf,c,d")[0:60]/2^60 − 0.5, a
    * fixed uniform quantizer every SQL engine re-derives. Cell
    * populations are less balanced than trained cells (uniform
    * directions vs data-adaptive), which costs recall, not
    * correctness — the probe/rank chain is identical.
    */
  def md5IvfCentroids(cells: Int = 16, dim: Int = 64): Array[Array[Double]] =
    Array.tabulate(cells, dim)((c, d) =>
      md5Coef("ivf", c.toString, d.toString))

  /** [[ivfTopK]] over md5-derived centroids — assignment, probing and
    * ranking all re-derive in ANSI SQL, so the full top-k output
    * oracles against DuckDB. Runs through the same codegen'd
    * [[graft.functions.VectorFunctions.nearest_centroids]] kernel as
    * the trained path.
    */
  def ivfTopKMd5(queries: DataFrame, candidates: DataFrame, vecCol: String,
      idCol: String, k: Int, cells: Int = 16, nprobe: Int = 4,
      dim: Int = 64): DataFrame =
    ivfTopK(queries, candidates, vecCol, idCol, k,
      md5IvfCentroids(cells, dim), nprobe)

  /** md5-derived PQ codebooks — the ORACLE variant of
    * [[trainPqCodebooks]]: codeword (sub, code, d) =
    * md5("pq,sub,code,d")[0:60]/2^60 − 0.5. Untrained codewords
    * reconstruct coarser (recall cost, borne by the wider exact
    * re-rank shortlist), but encode/decode/score re-derive exactly.
    */
  def md5PqBooks(m: Int = 8, codes: Int = 16,
      dim: Int = 64): Array[Array[Array[Double]]] = {
    val sub = dim / m
    Array.tabulate(m, codes, sub)((j, c, d) =>
      md5Coef("pq", j.toString, c.toString, d.toString))
  }

  /** [[pqTopK]] over md5-derived codebooks — the code assignment,
    * reconstruction, approximate scoring, shortlist cut and exact
    * re-rank all re-derive in ANSI SQL (full top-k oracle vs DuckDB).
    */
  def pqTopKMd5(queries: DataFrame, candidates: DataFrame, vecCol: String,
      idCol: String, k: Int, m: Int = 8, codes: Int = 16,
      shortlist: Int = 64, dim: Int = 64): DataFrame =
    pqTopK(queries, candidates, vecCol, idCol, k, md5PqBooks(m, codes, dim),
      shortlist, dim)

  /** [[lshTopK]] over the md5-derived planes — every stage re-derives
    * in ANSI SQL, so the full top-k output oracles against DuckDB.
    */
  def lshTopKMd5(queries: DataFrame, candidates: DataFrame, vecCol: String,
      idCol: String, k: Int, planes: Int = 5, tables: Int = 6,
      dim: Int = 64): DataFrame = {
    def banded(df: DataFrame, id: String, v: String) =
      df.select(col(idCol).as(id), col(vecCol).as(v),
        posexplode(md5PlaneBuckets(col(vecCol), planes, tables, dim))
          .as(Seq("table", "bucket")))
    val q = banded(queries, "query_id", "qv")
    val c = banded(candidates, "neighbor_id", "cv")
    rankCandidates(c.join(broadcast(q), Seq("table", "bucket")), k)
  }

  /** [[knnGraph]] over the md5-derived planes (oracle path). */
  def knnGraphMd5(corpus: DataFrame, vecCol: String, idCol: String, k: Int,
      planes: Int = 5, tables: Int = 6, dim: Int = 64): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val banded = Dedup.tracked(corpus
      .select(col(idCol).as("__id"), col(vecCol).as("__v"),
        posexplode(md5PlaneBuckets(col(vecCol), planes, tables, dim))
          .as(Seq("table", "bucket")))
      .persist(StorageLevel.MEMORY_AND_DISK))
    val a = banded.select(col("table"), col("bucket"),
      col("__id").as("query_id"), col("__v").as("qv"))
    val b = banded.select(col("table"), col("bucket"),
      col("__id").as("neighbor_id"), col("__v").as("cv"))
    rankCandidates(a.join(b, Seq("table", "bucket")), k)
  }

  /** Margin-based parallel-pair mining (Artetxe & Schwenk, "Margin-based
    * Parallel Corpus Mining with Multilingual Sentence Embeddings",
    * ACL 2019 — public literature): score a candidate pair (x, y) —
    * x from the source side, y from the target side — by the RATIO
    * margin
    *
    *   margin(x, y) = cos(x, y) / ((meanK(x→tgt) + meanK(y→src)) / 2)
    *
    * where meanK(v→side) is the mean cosine of v's k nearest neighbors
    * on the OTHER side. The per-item normalizer cancels "cosine
    * inflation" (hubness / register effects), which is what makes one
    * mining threshold transferable across language pairs and domains —
    * the operator a multilingual 100 TB pretraining pipeline runs to
    * mine bitext.
    *
    * Scale shape: `queries` is the bounded mining batch (broadcast);
    * the forward ranking is one window per query over the target scan;
    * the reverse means are computed ONLY for the ≤ |queries|·pool
    * surviving candidates (broadcast against one source-side scan) —
    * never corpus × corpus. For full corpus×corpus mining, swap the
    * exact rankings for any ANN tier above (LSH/IVF/HNSW); the margin
    * arithmetic is tier-agnostic.
    *
    * EXACTNESS (the oracle contract): per-pair cosines quantize to
    * integer MICRO-units before any aggregation, so both k-sums are
    * order-free integer arithmetic in any engine, and the margin is
    * one fixed IEEE tree over exactly-derived operands —
    *   margin = (cm · 2k) / (sumK_fwd + sumK_rev)
    * — bit-identical between Spark and the DuckDB oracle. Rankings
    * order by (quantized cosine, id) and (margin, id), both engine-
    * stable.
    */
  def marginMining(srcCorpus: DataFrame, tgtCorpus: DataFrame,
      queries: DataFrame, vecCol: String, idCol: String,
      k: Int = 4, pool: Int = 8, topPairs: Int = 3): DataFrame = {
    require(pool >= k && pool >= topPairs,
      "the candidate pool must cover both the k-NN mean and the output pairs")
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val tgt = tgtCorpus.select(col(idCol).as("matched_id"), col(vecCol).as("cv"))
    val wFwd = Window.partitionBy(col("query_id"))
      .orderBy(col("cm").desc, col("matched_id"))
    // forward: each query's pool of nearest target vectors, quantized.
    // qv is consumed by the map-side cosine and dropped BEFORE the
    // per-query window exchange — the only full |tgt|×|queries|-volume
    // shuffle then carries one vector per row, not two (guide §2.3)
    val fwd = tgt.join(q)
      .withColumn("cm", round(cosine(col("qv"), col("cv")) * lit(1e6))
        .cast("long"))
      .select(col("query_id"), col("matched_id"), col("cv"), col("cm"))
      .withColumn("frank", row_number().over(wFwd).cast("long"))
      .filter(col("frank") <= math.max(k, pool))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fwdTracked = Dedup.tracked(fwd)
    // meanK numerator per query (exact integer k-sum)
    val sumFwd = fwdTracked.filter(col("frank") <= k)
      .groupBy("query_id")
      .agg(org.apache.spark.sql.functions.sum(col("cm")).as("sum_fwd"))
    // reverse: the bounded candidate set's k nearest SOURCE vectors —
    // one source scan, candidates broadcast
    val cands = fwdTracked.filter(col("frank") <= pool)
      .select(col("matched_id"), col("cv")).distinct()
    val src = srcCorpus.select(col(idCol).as("src_id"), col(vecCol).as("sv"))
    val wRev = Window.partitionBy(col("matched_id"))
      .orderBy(col("rcm").desc, col("src_id"))
    val sumRev = src.join(broadcast(cands))
      .withColumn("rcm", round(cosine(col("cv"), col("sv")) * lit(1e6))
        .cast("long"))
      .withColumn("rrank", row_number().over(wRev))
      .filter(col("rrank") <= k)
      .groupBy("matched_id")
      .agg(org.apache.spark.sql.functions.sum(col("rcm")).as("sum_rev"))
    // margin = (cm · 2k) / (sum_fwd + sum_rev): one IEEE division of
    // exactly-derived integers
    val wM = Window.partitionBy(col("query_id"))
      .orderBy(col("margin").desc, col("matched_id"))
    fwdTracked.filter(col("frank") <= pool)
      .join(sumFwd, Seq("query_id"))
      .join(sumRev, Seq("matched_id"))
      .withColumn("margin",
        (col("cm").cast("double") * lit(2.0 * k)) /
          (col("sum_fwd") + col("sum_rev")).cast("double"))
      .withColumn("rank", row_number().over(wM).cast("long"))
      .filter(col("rank") <= topPairs)
      .select(col("query_id"), col("rank"), col("matched_id"),
        round(col("margin"), 6).as("margin"))
  }

  /** CORPUS-SCALE margin mining — [[marginMining]]'s ANN composition,
    * the runnable path the exact tier's scaladoc promised: both the
    * forward pool and the reverse k-NN means come from sharded HNSW
    * indexes ([[Hnsw.probeStreaming]]), so EVERY source item mines
    * against the whole target corpus with
    *
    *  - no corpus broadcast: the query side stays a DataFrame into the
    *    shard probes (the exact tier broadcasts its bounded query
    *    batch — correct there, fatal at corpus scale),
    *  - no corpus × corpus: probe work is |src|·shards + |cands|·shards
    *    graph searches; the reverse means touch ONLY the ≤ |src|·pool
    *    distinct forward candidates,
    *  - bounded shard probes: a task serves one shard's query stream
    *    against one graph loaded once from the index side channel.
    *
    * The margin arithmetic is the exact tier's, applied to the ANN
    * rankings: cosines quantize to integer micros, both k-sums are
    * order-free integer aggregation, margin = (cm·2k)/(sumFwd+sumRev).
    * With exhaustive search parameters (ef ≥ shard size) the candidate
    * sets equal the exact tier's and the mined margins match it
    * bit-for-bit (spec'd); at production ef the contract is recall
    * parity on true pairs, the standard ANN trade. Indexes persist
    * under `indexDir/{src,tgt}` — re-mining after an append rebuilds
    * only via [[Hnsw.appendToShardedIndex]] + [[Hnsw.saveShardedIndex]].
    */
  def marginMiningAnn(srcCorpus: DataFrame, tgtCorpus: DataFrame,
      vecCol: String, idCol: String, indexDir: String,
      k: Int = 4, pool: Int = 8, topPairs: Int = 3, shards: Int = 4,
      m: Int = 8, efConstruction: Int = 64, ef: Int = 64,
      reuseIndexes: Boolean = false,
      fsConf: Map[String, String] = Map.empty): DataFrame = {
    require(pool >= k && pool >= topPairs,
      "the candidate pool must cover both the k-NN mean and the output pairs")
    // `reuseIndexes` skips the build when the side channel is already
    // populated — the incremental re-mining path: after an append,
    // Hnsw.loadShardedIndex → appendToShardedIndex (touched shards
    // only) → saveShardedIndex refreshes the layout in O(new), then
    // this call mines against it without rebuilding either side
    // ready = a complete, current-format, pointer-published layout
    // (same conf resolution as the executor-side shard I/O — the
    // check must not pass where the tasks would fail); anything else —
    // absent, half-published, pre-format-2, wrong codec — rebuilds
    // instead of deserializing garbage or probing empty
    def haveIndex(side: String): Boolean =
      Hnsw.indexReady(s"$indexDir/$side", Hnsw.taskConf(
        Hnsw.sessionFsOverrides(srcCorpus.sparkSession) ++ fsConf))
    if (!reuseIndexes || !haveIndex("tgt"))
      Hnsw.saveShardedIndex(
        Hnsw.buildShardedIndex(tgtCorpus, idCol, vecCol, shards, m,
          efConstruction), s"$indexDir/tgt", fsConf)
    if (!reuseIndexes || !haveIndex("src"))
      Hnsw.saveShardedIndex(
        Hnsw.buildShardedIndex(srcCorpus, idCol, vecCol, shards, m,
          efConstruction), s"$indexDir/src", fsConf)
    // forward: every source item's candidate pool over the target
    // index — the query stream is the source CORPUS, never collected
    // the probe merges shards by raw cosine; the mining pool re-ranks
    // by (quantized micros, id) — the EXACT tier's (and the oracle's)
    // order — over a beam probed with +8 SLACK, so a micro-tie at the
    // pool boundary cannot split membership differently across
    // engines unless >8 candidates tie within one micro (vanishing;
    // within-pool ordering is exactly the oracle's regardless)
    val wFwd = Window.partitionBy(col("query_id"))
      .orderBy(col("cm").desc, col("matched_id"))
    val fwd = Hnsw.probeStreaming(
        srcCorpus.select(col(idCol), col(vecCol)),
        s"$indexDir/tgt", shards, idCol, vecCol,
        math.max(k, pool) + 8, ef, excludeSelf = false, fsConf = fsConf)
      .withColumnRenamed("neighbor_id", "matched_id")
      .withColumn("cm", round(col("cosine") * lit(1e6)).cast("long"))
      .withColumn("frank", row_number().over(wFwd).cast("long"))
      .drop("rank")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fwdTracked = Dedup.tracked(fwd)
    val sumFwd = fwdTracked.filter(col("frank") <= k)
      .groupBy("query_id")
      .agg(org.apache.spark.sql.functions.sum(col("cm")).as("sum_fwd"))
    // reverse: the bounded forward-candidate set re-acquires its
    // vectors by an id join (shuffle, no broadcast of either corpus)
    // and streams through the SOURCE index
    val cands = fwdTracked.filter(col("frank") <= pool)
      .select(col("matched_id").as(idCol)).distinct()
      .join(tgtCorpus.select(col(idCol), col(vecCol)), Seq(idCol))
    val sumRev = Hnsw.probeStreaming(cands, s"$indexDir/src", shards,
        idCol, vecCol, k, ef, excludeSelf = false, fsConf = fsConf)
      .withColumn("rcm", round(col("cosine") * lit(1e6)).cast("long"))
      .groupBy(col("query_id").as("matched_id"))
      .agg(org.apache.spark.sql.functions.sum(col("rcm")).as("sum_rev"))
    val wM = Window.partitionBy(col("query_id"))
      .orderBy(col("margin").desc, col("matched_id"))
    fwdTracked.filter(col("frank") <= pool).drop("frank")
      .join(sumFwd, Seq("query_id"))
      .join(sumRev, Seq("matched_id"))
      .withColumn("margin",
        (col("cm").cast("double") * lit(2.0 * k)) /
          (col("sum_fwd") + col("sum_rev")).cast("double"))
      .withColumn("rank", row_number().over(wM).cast("long"))
      .filter(col("rank") <= topPairs)
      .select(col("query_id"), col("rank"), col("matched_id"),
        round(col("margin"), 6).as("margin"))
  }

  def lshTopK(queries: DataFrame, candidates: DataFrame, vecCol: String,
      idCol: String, k: Int, planes: Int = 5, tables: Int = 6,
      seed: Long = 11L): DataFrame = {
    def banded(df: DataFrame, id: String, v: String) =
      df.select(col(idCol).as(id), col(vecCol).as(v),
        posexplode(hyperplaneTables(col(vecCol), planes, tables, seed))
          .as(Seq("table", "bucket")))
    val q = banded(queries, "query_id", "qv")
    val c = banded(candidates, "neighbor_id", "cv")
    rankCandidates(c.join(broadcast(q), Seq("table", "bucket")), k)
  }

  // ------------------------------------------------------------- PQ

  /** Train product-quantization codebooks (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011 — public
    * literature): the vector splits into `m` contiguous subspaces, each
    * with its own `k`-centroid quantizer, so a vector encodes to m
    * small codes — dim·4 bytes shrink to m bytes of codes at
    * k ≤ 256, the memory-bound regime every billion-vector index
    * lives in.
    *
    * Training mirrors [[trainIvfCentroids]]'s scale posture: a bounded
    * hash-threshold sample, and per Lloyd iteration ONE aggregation
    * job for ALL m subspaces — subvectors explode map-side tagged by
    * subspace, assignment runs against each subspace's centroids, and
    * a groupBy (subspace, cluster) [[graft.functions.VectorSumAgg]]
    * reduces one row per subvector. Model state: m × k × (dim/m)
    * doubles on the driver (tiny, like any learned model).
    */
  def trainPqCodebooks(corpus: DataFrame, vecCol: String, m: Int = 8,
      k: Int = 16, iters: Int = 2, maxTrain: Int = 20000,
      dim: Int = 64): Array[Array[Array[Double]]] = {
    import org.apache.spark.storage.StorageLevel
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val sub = dim / m
    val vecs = corpus.select(col(vecCol).cast("array<double>").as("v"))
    val n = vecs.count()
    val M = 1000000L
    val keep = if (n <= maxTrain) M
      else math.max(1L, (maxTrain.toDouble / n * M).toLong)
    require(n > 0, "cannot train PQ codebooks on an empty corpus")
    val subs = vecs
      .filter(pmod(hash(col("v")), lit(M)) < lit(keep))
      .select(explode(sequence(lit(0), lit(m - 1))).as("subspace"), col("v"))
      .select(col("subspace"),
        expr(s"slice(v, subspace * $sub + 1, $sub)").as("sv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // seed all m subspaces in one pass: top-k subvectors per subspace
    // by content hash (deterministic, order-free)
    val wSeed = Window.partitionBy(col("subspace")).orderBy(hash(col("sv")))
    var books: Array[Array[Array[Double]]] = {
      val rows = subs.withColumn("r", row_number().over(wSeed))
        .filter(col("r") <= k)
        .collect()
      val bySub = rows.groupBy(_.getAs[Int]("subspace"))
      (0 until m).map { j =>
        bySub.getOrElse(j, Array.empty)
          .map(_.getSeq[Double](1).toArray).toArray
      }.toArray
    }
    for (_ <- 0 until iters) {
      // one job: per-subspace nearest-centroid assignment, union of the
      // m branches, grouped vector-sum (map-side partials)
      val assigned = (0 until m).map { j =>
        subs.filter(col("subspace") === j)
          .select(col("subspace"),
            element_at(graft.functions.VectorFunctions.nearest_centroids(
              col("sv"), books(j), 1), 1).as("cluster"), col("sv"))
      }.reduce(_.unionAll(_))
      val stats = assigned.groupBy(col("subspace"), col("cluster"))
        .agg(graft.functions.VectorFunctions.vector_sum(col("sv")).as("vsum"),
          count(lit(1)).as("n"))
        .collect()
      val byKey = stats.map(r => (r.getAs[Int]("subspace"), r.getAs[Int]("cluster")) ->
        (r.getSeq[Double](2).toArray, r.getAs[Long]("n"))).toMap
      books = books.zipWithIndex.map { case (book, j) =>
        book.zipWithIndex.map { case (c, ci) =>
          byKey.get((j, ci)) match {
            case Some((s, cnt)) => s.map(_ / cnt)
            case None => c
          }
        }
      }
    }
    subs.unpersist()
    books
  }

  /** PQ code column: array of m centroid indices, one per subspace —
    * pure map-side expression work (slice + the native
    * nearest-centroid kernel), no shuffle, codegen-resident.
    */
  def pqEncode(vec: Column, books: Array[Array[Array[Double]]],
      dim: Int = 64): Column = {
    val m = books.length
    val sub = dim / m
    array(books.zipWithIndex.map { case (book, j) =>
      element_at(graft.functions.VectorFunctions.nearest_centroids(
        slice(vec.cast("array<double>"), j * sub + 1, sub), book, 1), 1)
    }.toIndexedSeq: _*)
  }

  /** Approximate reconstruction from PQ codes: each code picks its
    * subspace centroid, concatenated back to a dim-vector. The
    * codebooks ride as tiny literal arrays (m·k·sub doubles), so
    * decoding is in-expression — no join, no shuffle.
    */
  def pqDecode(codes: Column, books: Array[Array[Array[Double]]]): Column =
    flatten(array(books.zipWithIndex.map { case (book, j) =>
      element_at(typedlit(book.map(_.toSeq).toSeq),
        element_at(codes, j + 1) + 1)
    }.toIndexedSeq: _*))

  /** PQ approximate top-k with exact re-ranking — the standard two-tier
    * search: (1) candidates are scored from their CODES ONLY (decode +
    * cosine against the broadcast query set) and cut to a per-query
    * `shortlist`; (2) only shortlisted ids join back to the full
    * vectors for exact scoring. At 100 TB tier 1 scans m-byte codes
    * (32× smaller than raw float32 vectors — less I/O, less memory,
    * same plan shape), and tier 2 touches `shortlist` full vectors per
    * query instead of the corpus.
    */
  def pqTopK(queries: DataFrame, candidates: DataFrame, vecCol: String,
      idCol: String, k: Int, books: Array[Array[Array[Double]]],
      shortlist: Int = 64, dim: Int = 64): DataFrame = {
    val codes = candidates.select(col(idCol).as("neighbor_id"),
      pqEncode(col(vecCol), books, dim).as("codes"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id"))
    val short = codes.join(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("approx", cosine(col("qv"), pqDecode(col("codes"), books)))
      .withColumn("arank", row_number().over(wApprox))
      .filter(col("arank") <= shortlist)
      .select(col("query_id"), col("qv"), col("neighbor_id"))
    val full = candidates.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    short.join(full, Seq("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication") — the embedding-
    * space dedup tier: near-duplicate MEANING (paraphrases, template
    * rewrites) that no lexical pass (MinHash/SimHash/suffix grams)
    * can see. Cluster the corpus in embedding space, then prune
    * within each cluster any vector whose cosine to a LOWER-ID
    * cluster-mate reaches `tau` — keep-one-survivor per semantic
    * group with the min-id as the deterministic representative
    * (the paper keeps a random one; min-id makes reruns and the SQL
    * oracle bit-stable).
    *
    * Scale: the candidate join keys on the CLUSTER assignment —
    * O(Σ cluster²) pairs, never corpus², exactly the paper's trick;
    * cluster count is the knob that bounds the quadratic term (they
    * use k ≈ √N at web scale). Assignment is one broadcast-centroid
    * map pass, the pair join one hash shuffle on the cluster id.
    * Output: (vec_id, cluster, kept) — downstream keeps `kept` rows.
    */
  def semDedup(corpus: DataFrame, vecCol: String, idCol: String,
      centroids: Array[Array[Double]], tau: Double): DataFrame = {
    import graft.functions.VectorFunctions.nearest_centroids
    import org.apache.spark.storage.StorageLevel
    val assigned = corpus.select(
      col(idCol).cast("long").as("vec_id"),
      col(vecCol).as("v"),
      element_at(nearest_centroids(col(vecCol), centroids, 1), 1)
        .cast("long").as("cluster"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val mates = assigned.select(col("cluster"),
      col("vec_id").as("mate_id"), col("v").as("mv"))
    val dropped = assigned.join(mates, Seq("cluster"))
      .filter(col("mate_id") < col("vec_id"))
      .filter(cosine(col("v"), col("mv")) >= tau)
      .select(col("vec_id")).distinct()
    assigned.select("vec_id", "cluster")
      .join(dropped.withColumn("kept", lit(false)), Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("kept"), lit(true)).as("kept"))
  }

  /** [[semDedup]] over the md5-derived centroids — assignment,
    * cluster-bounded pair pruning and survivor choice all re-derive
    * in ANSI SQL (the gate variant, like [[ivfTopKMd5]]); production
    * runs pass [[trainIvfCentroids]] output instead.
    */
  def semDedupMd5(corpus: DataFrame, vecCol: String, idCol: String,
      cells: Int, tau: Double, dim: Int = 64): DataFrame =
    semDedup(corpus, vecCol, idCol, md5IvfCentroids(cells, dim), tau)
}
