package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus deduplication operators (SURVEY.md §2d).
  *
  * Scale posture: every near-dup method is bucketed — candidates come
  * from equality joins on band/bucket keys (shuffle on the key, linear
  * in corpus size for bounded bucket sizes), never from an O(n²) cross
  * join. Exact verification happens only within candidate pairs.
  *
  * Caching: signature/bucket tables are persisted (self-joins would
  * otherwise re-execute the sketch subtree per reference) and tracked;
  * call [[Dedup.releaseCaches]] after consuming a pass's output to
  * return the executor storage — a long-lived driver that never
  * releases would pin every pass's blocks until LRU eviction.
  */
object Dedup {

  private val trackedCaches =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val trackedRdds =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()

  private[graft] def tracked(df: DataFrame): DataFrame = {
    trackedCaches.add(df)
    df
  }

  /** Lineage-truncate `df` (lazy localCheckpoint) and TRACK the
    * checkpointed RDD for [[releaseCaches]]: `Dataset.unpersist` is a
    * no-op for checkpoint blocks (they are not CacheManager entries),
    * so without this a long session — Bench runs 150+ queries in one
    * JVM — accumulates every pass's blocks until GC gets around to
    * them. Releasing makes the returned frame UNRECOMPUTABLE (the
    * lineage is gone) — callers release only after the output is
    * consumed, the existing releaseCaches contract.
    */
  private[graft] def truncated(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(false)
    org.apache.spark.sql.graftbridge.Bridge.checkpointedRdd(cp)
      .foreach(trackedRdds.add)
    cp
  }

  /** Unpersist every DataFrame cached (and checkpoint block written)
    * by dedup/curation passes so far — safe once their outputs have
    * been consumed.
    */
  def releaseCaches(): Unit = {
    var d = trackedCaches.poll()
    while (d != null) { d.unpersist(false); d = trackedCaches.poll() }
    var r = trackedRdds.poll()
    while (r != null) { r.unpersist(false); r = trackedRdds.poll() }
  }

  /** Exact dedup: group by content fingerprint, keep the smallest id.
    * One shuffle on the 128-bit fingerprint.
    */
  def exactSurvivors(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    val w = Window.partitionBy(fp)
    docs.withColumn("__keep", min(col(idCol)).over(w))
      .filter(col(idCol) === col("__keep"))
      .drop("__keep")
  }

  // ---------------------------------------------------------------- MinHash

  /** MinHash permutation family h_i(x) = (a_i·x + b_i) mod P lives in
    * [[graft.functions.MinHashSignature]] (seeded → stable across
    * runs/executors); P is shared here for the shingle pre-hash.
    */
  private val Prime = 2147483647L // 2^31 - 1

  /** (id, signature array<long>) — one row per doc, computed entirely
    * per-row (shingles → hashes → per-permutation array_min as nested
    * array expressions). NO explode, NO groupBy, NO shuffle: signature
    * generation over a 100 TB corpus is a map-only scan. Each
    * intermediate is projected to its own column so Catalyst keeps it
    * materialized once per row (multi-referenced aliases don't
    * collapse).
    *
    * `toksCol`: name of an already-projected token-array column
    * (`TextAnalysis.tokens(textCol)` values) — a composed pipeline
    * that tokenized upstream (curate's annotate stage) passes it so
    * the regex normalize+split doesn't run a second full-corpus pass
    * here (guide §2.4 shared-subtree reuse; identical values by
    * construction).
    */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String,
      nGram: Int = 3, numPerm: Int = 64, seed: Long = 7L,
      toksCol: Option[String] = None): DataFrame = {
    docs
      .select(col(idCol), toksCol.map(col)
        .getOrElse(TextAnalysis.tokens(col(textCol))).as("__toks"))
      // distinct 31-bit shingle hashes, no string materialization
      .select(col(idCol),
        graft.functions.HashFunctions.ngram_hashes(col("__toks"), nGram,
          mod31 = true).as("__h"))
      .select(col(idCol),
        graft.functions.HashFunctions.minhash_signature(col("__h"), numPerm, seed)
          .as("signature"))
  }

  /** LSH banding: signature → (band, bandHash) keys; docs sharing any
    * band bucket become candidate pairs; pairs are scored by estimated
    * Jaccard (fraction of matching signature components) and filtered.
    * Returns (id_a, id_b, est_jaccard), id_a < id_b.
    */
  def minhashPairs(docs: DataFrame, textCol: String, idCol: String,
      nGram: Int = 3, numPerm: Int = 64, bands: Int = 16,
      threshold: Double = 0.5, seed: Long = 7L,
      toksCol: Option[String] = None): DataFrame = {
    require(numPerm % bands == 0, "bands must divide numPerm")
    val rowsPerBand = numPerm / bands
    // The signature table feeds both sides of the bucket self-join (and
    // the verify stage). Without persisting, Catalyst re-executes the
    // full shingle→hash→64-min-agg subtree once per reference — the
    // standard LSH pattern (cf. Spark MLlib LSH) is to materialize it.
    val sigs = tracked(
      minhashSignatures(docs, textCol, idCol, nGram, numPerm, seed, toksCol)
        .persist(StorageLevel.MEMORY_AND_DISK))

    val bandKeys = (0 until bands).map { b =>
      xxhash64(concat_ws(",",
        (0 until rowsPerBand).map(r => col("signature")(b * rowsPerBand + r)): _*))
    }
    val banded = tracked(
      sigs.select(col(idCol).as("id"), col("signature"),
        posexplode(array(bandKeys: _*)).as(Seq("band", "bandkey")))
        .persist(StorageLevel.MEMORY_AND_DISK))

    val a = banded.select(col("band"), col("bandkey"),
      col("id").as("id_a"), col("signature").as("sig_a"))
    val b = banded.select(col("band"), col("bandkey"),
      col("id").as("id_b"), col("signature").as("sig_b"))
    // Score and threshold-filter BEFORE the pair dedup (guide §2.3):
    // est_jaccard is a deterministic function of the two signatures, so
    // every band-duplicate of a pair carries the same value and the
    // dedup output is unchanged — but the dropDuplicates exchange now
    // moves (id, id, double) rows for NEAR-DUP pairs only, instead of
    // every candidate occurrence dragging two numPerm-long signature
    // arrays through the shuffle. The estimate is recomputed per band
    // occurrence (≤ bands codegen'd folds per pair) — map-side CPU
    // traded for an order of magnitude fewer shuffle bytes.
    a.join(b, Seq("band", "bandkey"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numPerm)
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
      .dropDuplicates("id_a", "id_b")
  }

  /** First 60 bits of md5(s) as a non-negative long — the same
    * derivation DuckDB's `('0x'||substr(md5(s),1,15))::BIGINT`
    * computes, used for the oracle-path permutation coefficients. */
  private def md5Long60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  /** md5-variant MinHash pairs — the ORACLE path (the xxhash64
    * [[minhashPairs]] stays the throughput path, same split as
    * simhash/simhashMd5): every stage re-derives in ANSI SQL, so the
    * full candidate-pair output (not just counts) oracles against
    * DuckDB. Shingle pre-hash = the md5→60-bit chain simhashMd5 uses,
    * reduced mod P = 2^31-1; permutation family g_i(x) = (a_i·x + b_i)
    * mod P with coefficients THEMSELVES md5-derived from the
    * permutation index (a_i from md5(2i), b_i from md5(2i+1)) — the
    * coefficients must be mutually independent: a correlated family
    * like a_i = c·(i+1) lets one shared shingle with a tiny c·x mod P
    * win the argmin for EVERY permutation at once, gluing unrelated
    * docs together (caught by the recall/precision spec). Every
    * product stays under 2^62 so BIGINT arithmetic is exact in both
    * engines. Banding joins
    * on the VALUE tuple (decimal-rendered, '|'-joined) instead of a
    * hash of it — SQL-joinable, same buckets. Same scale shape as the
    * fast path: map-only signatures, bucketed self-join, no all-pairs.
    */
  def minhashMd5Pairs(docs: DataFrame, textCol: String, idCol: String,
      nGram: Int = 3, numPerm: Int = 64, bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    require(numPerm % bands == 0, "bands must divide numPerm")
    val rowsPerBand = numPerm / bands
    val sigs = tracked(docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        // fused native gram→md5→60-bit→distinct: no shingle-string
        // array materialized at all (the transform/slice/concat_ws
        // chain allocated one string per gram position); hash VALUES
        // bit-identical to the conv(substring(md5...)) chain the
        // oracle re-derives, distinct set identical (sorted — the
        // linear_minhash min fold is order-insensitive)
        graft.functions.HashFunctions.word_gram_md5_long60(
          col("__toks"), nGram, mod = Prime).as("__x"))
      .select(col(idCol), {
        val as = Array.tabulate(numPerm)(i =>
          (md5Long60((2 * i).toString) % (Prime - 1)) + 1)
        val bs = Array.tabulate(numPerm)(i =>
          md5Long60((2 * i + 1).toString) % Prime)
        graft.functions.HashFunctions.linear_minhash(col("__x"), as, bs,
          Prime).as("signature")
      })
      .persist(StorageLevel.MEMORY_AND_DISK))
    val bandKeys = (0 until bands).map { bnd =>
      concat_ws("|", (0 until rowsPerBand).map(r =>
        col("signature")(bnd * rowsPerBand + r).cast("string")): _*)
    }
    val banded = tracked(
      sigs.select(col(idCol).as("id"), col("signature"),
        posexplode(array(bandKeys: _*)).as(Seq("band", "bandkey")))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val a = banded.select(col("band"), col("bandkey"),
      col("id").as("id_a"), col("signature").as("sig_a"))
    val b = banded.select(col("band"), col("bandkey"),
      col("id").as("id_b"), col("signature").as("sig_b"))
    // score + threshold before the dedup exchange — same rewrite as
    // [[minhashPairs]] (deterministic per-pair estimate, so the output
    // set and values are identical; only the shuffle shrinks)
    a.join(b, Seq("band", "bandkey"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numPerm)
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
      .dropDuplicates("id_a", "id_b")
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash per doc: per-feature 64-bit hashes vote on each bit;
    * the sign of the vote sets the bit. Features are word 3-gram
    * shingles — unigrams don't discriminate on small shared
    * vocabularies. Computed per-row with array expressions (vote vector
    * folded over the shingle hashes) — map-only, no shuffle.
    */
  def simhash(docs: DataFrame, textCol: String, idCol: String,
      nGram: Int = 3): DataFrame = {
    docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        graft.functions.HashFunctions.ngram_hashes(col("__toks"), nGram,
          mod31 = false).as("__h"))
      .select(col(idCol),
        graft.functions.HashFunctions.simhash64(col("__h")).as("simhash"))
  }

  /** Candidate pairs within Hamming distance `hamMax`, found by chunk
    * banding (a pair within distance d must agree on ≥1 of d+1 chunks —
    * 8 × 8-bit chunks guarantees d ≤ 7), verified with bit_count(xor).
    */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
      hamMax: Int = 7, nGram: Int = 3): DataFrame =
    simhashBandedPairs(simhash(docs, textCol, idCol, nGram), idCol, hamMax)

  /** md5-derived SimHash signature: shingle hash = the top 60 bits of
    * md5(shingle string), via builtins (md5 + conv). Same banding
    * guarantees as the XXH64 path but the whole hash chain is
    * re-derivable in ANSI SQL — this is the variant the DuckDB oracle
    * checks end-to-end (hex substring → int is one cast both engines).
    * The XXH64 [[simhash]] stays the throughput path: no shingle
    * strings materialized, one fused expression per row.
    */
  def simhashMd5(docs: DataFrame, textCol: String, idCol: String,
      nGram: Int = 3): DataFrame = {
    docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        // fused gram→md5→distinct (see minhashMd5Pairs) — simhash64's
        // per-bit votes over the distinct set are order-insensitive
        graft.functions.HashFunctions.word_gram_md5_long60(
          col("__toks"), nGram).as("__h"))
      .select(col(idCol),
        graft.functions.HashFunctions.simhash64(col("__h")).as("simhash"))
  }

  /** Chunk-banded Hamming pairs from a (id, simhash) signature table —
    * a pair within distance d must agree on ≥1 of d+1 chunks, so 8 ×
    * 8-bit chunks make the candidate generation EXACT for d ≤ 7 (no
    * recall loss to band-match luck), verified with bit_count(xor).
    */
  def simhashBandedPairs(sigs: DataFrame, idCol: String,
      hamMax: Int = 7): DataFrame = {
    require(hamMax <= 7, "8-chunk banding only guarantees hamming ≤ 7")
    val chunks = (0 until 8).map(j =>
      shiftrightunsigned(col("simhash"), j * 8).bitwiseAND(0xFFL))
    // both sides of the self-join read this — materialize once
    val banded = tracked(
      sigs.select(col(idCol).as("id"), col("simhash"),
        posexplode(array(chunks: _*)).as(Seq("chunk", "chunkval")))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val a = banded.select(col("chunk"), col("chunkval"),
      col("id").as("id_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("chunk"), col("chunkval"),
      col("id").as("id_b"), col("simhash").as("sh_b"))
    // verify + filter before the dedup exchange (same rewrite as
    // [[minhashPairs]]): the hamming distance is deterministic per
    // pair, so dedup-after-filter yields the identical output while
    // the exchange carries only pairs that PASS the distance bound
    a.join(b, Seq("chunk", "chunkval"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= hamMax)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
      .dropDuplicates("id_a", "id_b")
  }

  // ----------------------------------------------------- exact n-gram Jaccard

  /** Exact n-gram Jaccard for given candidate pairs (id_a, id_b):
    * set-intersection via an equality join on the shingle, never a
    * per-pair recomputation of full sets.
    */
  def ngramJaccard(docs: DataFrame, candidates: DataFrame, textCol: String,
      idCol: String, nGram: Int = 3,
      toksCol: Option[String] = None): DataFrame = {
    val cand = tracked(candidates.persist(StorageLevel.MEMORY_AND_DISK))
    // Only docs that appear in some candidate pair need shingles: the
    // candidate set is a near-dup fraction of the corpus, so pruning
    // here shrinks the explode+shuffle from O(corpus × shingles) to
    // O(candidates × shingles). Left unhinted so AQE broadcasts the id
    // list when it is small and falls back to a shuffle join when a
    // dup-heavy corpus makes it large.
    val candIds = cand.select(col("id_a").as("__cid"))
      .union(cand.select(col("id_b").as("__cid"))).distinct()
    // shingle table is read 3× (two pair sides + sizes) and the
    // candidate set twice — materialize both, or the upstream LSH DAG
    // re-executes once per reference
    val sh = tracked(docs
      .join(candIds, col(idCol) === col("__cid"), "left_semi")
      .select(col(idCol).as("id"), toksCol.map(col)
        .getOrElse(TextAnalysis.tokens(col(textCol))).as("__toks"))
      .select(col("id"),
        explode(graft.functions.HashFunctions.ngram_hashes(col("__toks"), nGram,
          mod31 = false)).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val common = cand
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), Seq("id_b"))
      .filter(col("sh_a") === col("sh_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), Seq("id_b"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .select("id_a", "id_b", "jaccard")
  }

  // ------------------------------------------------------- embedding near-dup

  /** Near-duplicate pairs by embedding cosine ≥ threshold. Candidates
    * from multi-table random-hyperplane LSH (union over tables →
    * near-certain recall for genuinely close vectors); exact cosine
    * verified per candidate pair only.
    */
  /** Recall calibration: a pair at cosine c collides in one table with
    * probability (1 − θ/π)^planes, θ = arccos(c); missing every table
    * is (1 − p)^tables. At the c = 0.95 decision boundary the defaults
    * give p ≈ 0.53 per table → miss ≈ 1.2e-4 over 12 tables, so even
    * hundreds of boundary pairs survive with near-certainty (8 planes
    * × 4 tables missed ~11% of boundary pairs — observed as 37/40 at
    * sf0.1). Fewer planes = wider buckets = more exact-cosine work;
    * raise `planes` with corpus size to keep buckets bounded.
    */
  def embeddingPairs(emb: DataFrame, vecCol: String, idCol: String,
      threshold: Double = 0.9, planes: Int = 6, tables: Int = 12,
      seed: Long = 11L): DataFrame = {
    val bucketed = tracked(
      emb.select(col(idCol).as("id"), col(vecCol).as("v"),
        posexplode(Similarity.hyperplaneTables(col(vecCol), planes, tables, seed))
          .as(Seq("table", "bucket")))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val a = bucketed.select(col("table"), col("bucket"),
      col("id").as("id_a"), col("v").as("v_a"))
    val b = bucketed.select(col("table"), col("bucket"),
      col("id").as("id_b"), col("v").as("v_b"))
    // exact-cosine verify + threshold before the dedup exchange (same
    // rewrite as [[minhashPairs]]): the cosine is deterministic per
    // pair, so scoring each table-occurrence (≤ tables dim-length
    // folds) and deduping the few ABOVE-threshold survivors yields the
    // identical output — while the dropDuplicates exchange carries
    // (id, id, double) rows instead of dragging both dim-sized vectors
    // of every candidate occurrence through the shuffle
    a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
      .dropDuplicates("id_a", "id_b")
  }
}
