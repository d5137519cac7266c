package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data
  * pipeline actually runs over a raw 100 TB crawl, built entirely from
  * the library's own operators so every stage keeps its scale shape:
  *
  *  1. annotate   — language ID, quality score, token count (pure
  *                  expression trees, map-only);
  *  2. filter     — keep wanted languages above a quality floor
  *                  (predicate pushes into the scan);
  *  3. exact dedup — fingerprint groupBy, keep smallest id (one
  *                  shuffle);
  *  4. near dedup — MinHash/LSH candidates → exact n-gram Jaccard
  *                  verify → drop the larger id of each verified pair
  *                  (bucket joins, never all-pairs).
  *
  * Returns the surviving documents with their annotations. The
  * `docs_removed_*` counters in [[CurationReport]] account for every
  * dropped row, so the pipeline's selectivity is observable per stage.
  */
case class CurationReport(input: Long, afterFilter: Long, afterExact: Long,
    afterNear: Long)

object Curation {

  /** Curate `docs`: annotate, filter, exact-dedup, near-dedup.
    *
    * @param minQuality   keep docs with quality ≥ this (0..1)
    * @param langs        keep docs whose predicted language is in this set
    * @param jaccard      verified n-gram Jaccard at or above ⇒ near-dup
    * @param lshThreshold estimated-Jaccard prefilter for LSH candidates
    *                     (recall knob: lower catches more, costs more
    *                     verification)
    */
  def curate(docs: DataFrame, textCol: String, idCol: String,
      minQuality: Double = 0.5, langs: Seq[String] = Seq("en"),
      jaccard: Double = 0.8, lshThreshold: Double = 0.5): DataFrame = {
    val (_, exactPlan) = textStages(docs, textCol, idCol, minQuality, langs)
    // the exact-dedup output feeds three consumers (LSH signatures, the
    // Jaccard-verify shingles, the final anti-join) — LINEAGE-TRUNCATE
    // it (lazy localCheckpoint): like a persist it materializes once,
    // but the downstream LSH/verify/anti-join plans reference one
    // LogicalRDD instead of re-ANALYZING the annotate+filter+window
    // tree per consumer (driver-side planning was a visible slice of
    // the pipeline's wall time; same trade as RunningSum.twoLevel —
    // recompute-on-failure given up, blocks free on GC).
    // The checkpoint CARRIES the annotate stage's token array (TokCol):
    // the LSH signature and Jaccard-verify stages consume it instead
    // of each re-running the regex normalize+split over the survivors
    // (guide §2.4 — bigger blocks traded for two fewer full tokenize
    // passes; values identical, it is the same expression un-recomputed)
    val exact = Dedup.truncated(exactPlan)
    nearDedup(exact, textCol, idCol, jaccard, lshThreshold,
      toksCol = Some(TokCol)).drop(TokCol)
  }

  /** Internal token-array column textStages projects once and the
    * dedup stages reuse (annotate already tokenizes every doc). */
  private val TokCol = "__toks"

  /** LEARNED quality filter, general tier (the DCLM/fastText-style
    * classifier a curation pipeline trains on "good corpus vs crawl"
    * labels): ridge least squares over HASHED TOKEN FEATURES, trained
    * DISTRIBUTED in one aggregation pass and scored in one map pass.
    *
    * Features: token t → bucket `pmod(xxhash64(t), d−1)` count, plus a
    * leading intercept component — the classic hashing trick, so the
    * model needs no vocabulary and d bounds everything. The bucket
    * counts build in ONE pass over each row's tokens
    * ([[graft.functions.HashBucketCounts]] — codegen'd, bit-identical
    * buckets to the SQL `pmod(xxhash64(t), d−1)`); the d−1-filter-pass
    * HOF formulation it replaced traversed every token array d−1
    * times at train AND score time (in-JVM A/B at d = 64: ~21× —
    * numbers on the expression's scaladoc). Training reduces to the
    * sufficient statistics XᵀX (d×d, flattened outer products summed
    * elementwise by [[graft.functions.VectorSumAgg]] — map-side
    * combinable, one shuffle row total) and Xᵀy; with d ≤ 64 the
    * driver-side solve (Gaussian elimination on XᵀX + λI) is
    * microseconds. At 100 TB: one scan to train, one to score —
    * nothing driver-side scales with rows.
    *
    * Returns the weights and a scorer that appends `scoreCol` (the
    * linear score; rank or threshold it — e.g. feed
    * [[graft.queries.Text.qualityBand]]'s banding or `curate`'s
    * quality floor). Exactness vs a driver-side reference fit is
    * spec'd in CurationSpec; the 2-parameter closed-form member of
    * this family is the ORACLED `q_quality_learned` gate key
    * ([[graft.queries.Text.qualityLearned]]).
    */
  def fitQualityRidge(docs: DataFrame, textCol: String, labelCol: String,
      d: Int = 16, lambda: Double = 1.0,
      scoreCol: String = "learned_quality"): (Array[Double], DataFrame => DataFrame) = {
    require(d >= 2 && d <= 64, "hashed feature dim must be in [2, 64]")
    // x(0) = intercept; x(j) = count of tokens hashing to bucket j−1,
    // all d−1 counts from ONE traversal of the token array
    def features(c: Column): Column =
      concat(array(lit(1.0)),
        graft.functions.HashFunctions.hash_bucket_counts(
          split(TextAnalysis.normalize(c), " "), d - 1))
    val feat = docs.select(features(col(textCol)).as("__x"),
      col(labelCol).cast("double").as("__y"))
    // ONE aggregation: Σ x⊗x (flattened d²) and Σ x·y — the map-side
    // partial is a (d² + d)-double buffer, independent of row count
    val row = feat.select(
      graft.functions.VectorFunctions.vector_sum(
        flatten(transform(col("__x"), xi =>
          transform(col("__x"), xj => xi * xj)))).as("xtx"),
      graft.functions.VectorFunctions.vector_sum(
        transform(col("__x"), xi => xi * col("__y"))).as("xty")).head()
    val xtx = row.getSeq[Double](0).toArray
    val xty = row.getSeq[Double](1).toArray
    val w = Curation.solveRidge(xtx, xty, d, lambda)
    val wLit = array(w.map(lit(_)).toIndexedSeq: _*)
    val scorer = (df: DataFrame) => df.withColumn(scoreCol,
      aggregate(zip_with(features(col(textCol)), wLit,
        (x, wi) => x * wi), lit(0.0), (acc, v) => acc + v))
    (w, scorer)
  }

  /** Solve (XᵀX + λI)w = Xᵀy by Gaussian elimination with partial
    * pivoting — d ≤ 64, a driver-side no-op next to the scans. The
    * intercept row is regularized too (harmless at these λ; keeps the
    * system symmetric positive definite).
    */
  private[graft] def solveRidge(xtxFlat: Array[Double], xty: Array[Double],
      d: Int, lambda: Double): Array[Double] = {
    val a = Array.tabulate(d, d)((i, j) =>
      xtxFlat(i * d + j) + (if (i == j) lambda else 0.0))
    val b = xty.clone()
    var i = 0
    while (i < d) {
      var p = i
      var r = i + 1
      while (r < d) { if (math.abs(a(r)(i)) > math.abs(a(p)(i))) p = r; r += 1 }
      val t = a(i); a(i) = a(p); a(p) = t
      val tb = b(i); b(i) = b(p); b(p) = tb
      val piv = a(i)(i)
      require(math.abs(piv) > 1e-12, "singular normal equations — raise lambda")
      r = i + 1
      while (r < d) {
        val f = a(r)(i) / piv
        var c = i
        while (c < d) { a(r)(c) -= f * a(i)(c); c += 1 }
        b(r) -= f * b(i)
        r += 1
      }
      i += 1
    }
    val w = new Array[Double](d)
    i = d - 1
    while (i >= 0) {
      var s = b(i)
      var c = i + 1
      while (c < d) { s -= a(i)(c) * w(c); c += 1 }
      w(i) = s / a(i)(i)
      i -= 1
    }
    w
  }

  /** Stages 1–3 (annotate → filter → exact dedup) as plans, shared by
    * [[curate]] and [[report]] so the counting twin doesn't re-derive
    * — and re-execute — the expensive scans.
    */
  private def textStages(docs: DataFrame, textCol: String, idCol: String,
      minQuality: Double, langs: Seq[String]): (DataFrame, DataFrame) = {
    // Annotate via PROJECTED intermediate columns (token array, marker
    // counts) instead of the inline langPredict/qualityScore trees:
    // the inlined form repeats the normalize+split subtree once per
    // marker set per reference and the resulting projection measured
    // ~1.2 s of driver-side planning per execution at ANY data size
    // (ProbeAnnotate: 1.3 s at 5k docs vs 1.8 s at 50k). Values are
    // bit-identical — the same folds over the same counts.
    val toks = TokCol
    val scoreCol = (l: String) => s"__ta_s_$l"
    val scored = TextAnalysis.LangMarkers.foldLeft(
        docs.withColumn(toks, TextAnalysis.tokens(col(textCol)))) {
      case (d, (l, ws)) => d.withColumn(scoreCol(l),
        TextAnalysis.markerCountFromTokens(col(toks), ws))
    }
    // the token array SURVIVES into the output (dropped by callers
    // after the dedup stages consume it — see [[curate]]/[[TokCol]])
    val annotated = scored
      .withColumn("__ta_ntok", TextAnalysis.wsTokenCount(col(textCol)))
      .withColumn("__ta_stop", TextAnalysis.markerCountFromTokens(
        col(toks), TextAnalysis.QualityStopwords))
      .withColumn("lang_pred", TextAnalysis.langPredictFromScores(
        TextAnalysis.LangMarkers.map { case (l, _) => l -> col(scoreCol(l)) }))
      .withColumn("quality", TextAnalysis.qualityFromCounts(
        col("__ta_ntok"), col("__ta_stop"),
        TextAnalysis.punctCount(col(textCol)),
        TextAnalysis.upperCount(col(textCol)),
        length(col(textCol)).cast("long")))
      .withColumn("n_tokens", col("__ta_ntok"))
      .drop((Seq("__ta_ntok", "__ta_stop") ++
        TextAnalysis.LangMarkers.map(m => scoreCol(m._1))): _*)
    val filtered = annotated
      .filter(col("lang_pred").isin(langs: _*) && col("quality") >= minQuality)
    (filtered, Dedup.exactSurvivors(filtered, textCol, idCol))
  }

  /** Stage 4: MinHash/LSH candidates → exact Jaccard verify → drop the
    * larger id of every verified pair (survivors never appear as id_b).
    */
  private def nearDedup(exact: DataFrame, textCol: String, idCol: String,
      jaccard: Double, lshThreshold: Double,
      toksCol: Option[String] = None): DataFrame = {
    val cands = Dedup.minhashPairs(exact, textCol, idCol,
      threshold = lshThreshold, toksCol = toksCol)
    val verified = Dedup.ngramJaccard(exact, cands, textCol, idCol,
        toksCol = toksCol)
      .filter(col("jaccard") >= jaccard)
    val losers = verified.select(col("id_b").as(idCol)).distinct()
    exact.join(losers, Seq(idCol), "left_anti")
  }

  /** The packing tail of a pretrain data pipeline: curated docs →
    * fixed-token chunks (window `chunkTokens`, stride `stride` — the
    * RAG chunker's shape) → greedy sequence packing per language into
    * `seqLen`-token training bins (cumulative-sum binning: one window
    * pass per language, no driver loop; a bin overflows by at most one
    * chunk − 1 tokens, the standard greedy-packing bound). Returns one
    * row per (lang, bin): chunk/doc counts and token totals — the
    * batch manifest a trainer's data loader consumes. The cumsum is
    * the two-level [[RunningSum.twoLevel]] pack (shard-local sums +
    * broadcast per-shard offsets), so at 100 TB each language's chunks
    * pack across every shard in parallel instead of serializing
    * through one task — identical bins by construction.
    */
  def pretrainPack(curated: DataFrame, textCol: String, idCol: String,
      langCol: String, chunkTokens: Int = 16, stride: Int = 12,
      seqLen: Int = 2048): DataFrame = {
    import org.apache.spark.sql.functions._
    val chunks = curated
      .select(col(idCol), col(langCol), split(col(textCol), " ").as("__t"))
      .withColumn("__n", size(col("__t")).cast("long"))
      .withColumn("__start",
        explode(sequence(lit(0L), col("__n") - 1, lit(stride.toLong))))
      .select(col(idCol), col(langCol),
        expr(s"__start div $stride").as("chunk_idx"),
        least(lit(chunkTokens.toLong), col("__n") - col("__start"))
          .as("chunk_tokens"))
    RunningSum.twoLevel(chunks, Seq(langCol),
        Seq(col(idCol), col("chunk_idx")), col("chunk_tokens"), "__cum")
      .withColumn("bin", expr(s"(__cum - chunk_tokens) div $seqLen"))
      .groupBy(col(langCol), col("bin"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col(idCol)).as("n_docs"),
        sum(col("chunk_tokens")).as("bin_tokens"),
        min(col(idCol)).as("first_doc"), max(col(idCol)).as("last_doc"))
      .orderBy(col(langCol), col("bin"))
  }

  /** [[curate]] plus a semantic (embedding-cosine) near-dup stage: after
    * the text passes, survivors whose embeddings sit within `cosine` of
    * a smaller-id survivor are dropped too — catches paraphrase-level
    * duplicates that shingle overlap can't see. `emb` joins on
    * (`embIdCol` = curated `idCol`); candidate pairs come from the
    * hyperplane-LSH buckets, so this stage is bucket-bounded like the
    * text one.
    */
  def curateWithEmbeddings(docs: DataFrame, textCol: String, idCol: String,
      emb: DataFrame, vecCol: String, embIdCol: String,
      cosine: Double = 0.95, minQuality: Double = 0.5,
      langs: Seq[String] = Seq("en"), jaccard: Double = 0.8,
      lshThreshold: Double = 0.5): DataFrame = {
    val textClean = curate(docs, textCol, idCol, minQuality, langs, jaccard,
      lshThreshold)
    // only surviving docs' embeddings participate
    val survEmb = emb.join(textClean.select(col(idCol).as(embIdCol)),
      Seq(embIdCol), "left_semi")
    val pairs = Dedup.embeddingPairs(survEmb, vecCol, embIdCol,
      threshold = cosine)
    val losers = pairs.select(col("id_b").as(idCol)).distinct()
    textClean.join(losers, Seq(idCol), "left_anti")
  }

  /** [[curateWithEmbeddings]]'s SemDeDup sibling: the semantic stage
    * runs [[Similarity.semDedup]] — k-means-cluster-bounded pruning
    * (Σ cluster² candidates) — instead of LSH-bucketed pair search.
    * Same contract: only text-surviving docs' embeddings participate,
    * semantic losers (cosine ≥ `tau` to a lower-id cluster-mate) drop
    * from the curated output, the min-id representative survives.
    * Prefer this stage when near-duplicates are dense (LSH buckets
    * degenerate toward all-pairs as duplicate density grows; cluster
    * count stays the explicit quadratic-term knob here).
    */
  def curateSemantic(docs: DataFrame, textCol: String, idCol: String,
      emb: DataFrame, vecCol: String, embIdCol: String,
      centroids: Array[Array[Double]], tau: Double = 0.95,
      minQuality: Double = 0.5, langs: Seq[String] = Seq("en"),
      jaccard: Double = 0.8, lshThreshold: Double = 0.5): DataFrame = {
    val textClean = curate(docs, textCol, idCol, minQuality, langs, jaccard,
      lshThreshold)
    val survEmb = emb.join(textClean.select(col(idCol).as(embIdCol)),
      Seq(embIdCol), "left_semi")
    val losers = Similarity
      .semDedup(survEmb, vecCol, embIdCol, centroids, tau)
      .filter(!col("kept"))
      .select(col("vec_id").as(idCol))
    textClean.join(losers, Seq(idCol), "left_anti")
  }

  /** Per-stage row counts for the same parameters (runs the pipeline's
    * counting twin; small results, driver-safe).
    */
  def report(docs: DataFrame, textCol: String, idCol: String,
      minQuality: Double = 0.5, langs: Seq[String] = Seq("en"),
      jaccard: Double = 0.8, lshThreshold: Double = 0.5): CurationReport = {
    import org.apache.spark.storage.StorageLevel
    val (filtered, exactPlan) = textStages(docs, textCol, idCol, minQuality,
      langs)
    // the exact-dedup output feeds three consumers (its count, the LSH
    // pass, the survivor anti-join) — materialize it once instead of
    // re-running the annotate/filter scans per consumer
    val exact = exactPlan.persist(StorageLevel.MEMORY_AND_DISK)
    try CurationReport(docs.count(), filtered.count(), exact.count(),
      nearDedup(exact, textCol, idCol, jaccard, lshThreshold,
        toksCol = Some(TokCol)).count())
    finally { exact.unpersist(false); () }
  }
}
