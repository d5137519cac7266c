package graft.ops

import org.apache.spark.sql.DataFrame
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
    val annotated = docs
      .withColumn("lang_pred", TextAnalysis.langPredict(col(textCol)))
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol),
        length(col(textCol)).cast("long")))
      .withColumn("n_tokens", TextAnalysis.wsTokenCount(col(textCol)))
    val filtered = annotated
      .filter(col("lang_pred").isin(langs: _*) && col("quality") >= minQuality)
    val exact = Dedup.exactSurvivors(filtered, textCol, idCol)

    // near-dup pass runs on the already-thinned corpus
    val cands = Dedup.minhashPairs(exact, textCol, idCol,
      threshold = lshThreshold)
    val verified = Dedup.ngramJaccard(exact, cands, textCol, idCol)
      .filter(col("jaccard") >= jaccard)
    // drop the larger id of every verified pair: survivors are docs that
    // never appear as id_b (left_anti on a smaller-keyed dup list)
    val losers = verified.select(col("id_b").as(idCol)).distinct()
    exact.join(losers, Seq(idCol), "left_anti")
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

  /** Per-stage row counts for the same parameters (runs the pipeline's
    * counting twin; small results, driver-safe).
    */
  def report(docs: DataFrame, textCol: String, idCol: String,
      minQuality: Double = 0.5, langs: Seq[String] = Seq("en"),
      jaccard: Double = 0.8, lshThreshold: Double = 0.5): CurationReport = {
    val annotated = docs
      .withColumn("lang_pred", TextAnalysis.langPredict(col(textCol)))
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol),
        length(col(textCol)).cast("long")))
    val filtered = annotated
      .filter(col("lang_pred").isin(langs: _*) && col("quality") >= minQuality)
    val exact = Dedup.exactSurvivors(filtered, textCol, idCol)
    val curated = curate(docs, textCol, idCol, minQuality, langs, jaccard,
      lshThreshold)
    CurationReport(docs.count(), filtered.count(), exact.count(),
      curated.count())
  }
}
