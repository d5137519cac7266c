package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Etl, Events, Graph, Relational, Stats, Temporal, Text, Vectors}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every `queries` key with a matching `oracleSql` entry is checked by
  * the driver against DuckDB on the same parquet tables. Column names
  * AND types match the SQL exactly (driver sorts columns by name before
  * hashing); doubles come from exact decimal arithmetic so both engines
  * produce bit-identical values (see Relational scaladoc).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q3_shipping_priority" -> (Relational.q3ShippingPriority _),
    "q4_order_priority" -> (Relational.q4OrderPriority _),
    "q5_local_supplier" -> (Relational.q5LocalSupplier _),
    "q6_revenue_forecast" -> (Relational.q6RevenueForecast _),
    "q7_volume_shipping" -> (Relational.q7VolumeShipping _),
    "q10_returned_items" -> (Relational.q10ReturnedItems _),
    "q_anti_join" -> (Relational.qAntiJoin _),
    "q_rollup" -> (Relational.qRollup _),
    "q_cube" -> (Relational.qCube _),
    "q_having" -> (Relational.qHaving _),
    "q_distinct_agg" -> (Relational.qDistinctAgg _),
    "q_window_running" -> (Relational.qWindowRunning _),
    "q_topk_per_group" -> (Relational.qTopkPerGroup _),
    "q_topk_custom" -> (Relational.qTopkCustom _),
    "q_topk_rewritten" -> (Relational.qTopkRewritten _),
    "q_sort_limit" -> (Relational.qSortLimit _),
    "q_scalar_subquery" -> (Relational.qScalarSubquery _),
    "q_union_dedup" -> (Relational.qUnionDedup _),
    "q_lag_lead" -> (Relational.qLagLead _),
    "q_skew_salted_join" -> (Relational.qSkewSaltedJoin _),
    "q_percentiles" -> (Relational.qPercentiles _),
    "q_full_outer" -> (Relational.qFullOuter _),
    "q_intersect_except" -> (Relational.qIntersectExcept _),
    "q_null_safe_join" -> (Relational.qNullSafeJoin _),
    "q_intersect_all" -> (Relational.qIntersectAll _),
    "q_grouping_sets" -> (Relational.qGroupingSets _),
    "q_window_range_frame" -> (Relational.qWindowRangeFrame _),
    "q_moving_avg" -> (Relational.qMovingAvg _),
    "q8_market_share" -> (Relational.q8MarketShare _),
    "q13_order_dist" -> (Relational.q13OrderDist _),
    "q17_small_qty" -> (Relational.q17SmallQty _),
    "q18_large_volume" -> (Relational.q18LargeVolume _),
    "q14_promo_revenue" -> (Relational.q14PromoRevenue _),
    "q2_min_cost_supplier" -> (Relational.q2MinCostSupplier _),
    "q9_product_profit" -> (Relational.q9ProductProfit _),
    "q15_top_supplier" -> (Relational.q15TopSupplier _),
    "q22_global_sales" -> (Relational.q22GlobalSales _),
    "q12_late_lines" -> (Relational.q12LateLines _),
    "q16_supplier_variety" -> (Relational.q16SupplierVariety _),
    "q20_excess_stock" -> (Relational.q20ExcessStock _),
    "q21_waiting_supplier" -> (Relational.q21WaitingSupplier _),
    "q_stratified_sample" -> (Events.stratifiedSample _),
    "q11_important_stock" -> (Relational.q11ImportantStock _),
    "q_profile" -> (Relational.qProfile _),
    "q_session_window" -> (Events.sessionWindow _),
    "q_gap_fill" -> (Events.gapFill _),
    "q_transition_matrix" -> (Events.transitionMatrix _),
    "q_outliers" -> (Events.outliers _),
    "q_mad_outliers" -> (Events.madOutliers _),
    "q_zorder_pruned" -> (Events.zorderPruned _),
    "text_pii_redact" -> (Text.piiRedact _),
    "emb_centroids" -> (Vectors.embCentroids _),
    "emb_quantize" -> (Vectors.embQuantize _),
    "dedup_lines" -> (Text.dedupLines _),
    "q_group_cap" -> (Text.groupCap _),
    "text_unigram_logprob" -> (Text.unigramLogprob _),
    "q_window_firsts" -> (Relational.qWindowFirsts _),
    "text_tfidf" -> ((s, d) => Text.tfidf(s, d)),
    "q_disjunctive_join" -> (Relational.qDisjunctiveJoin _),
    "q_unpivot" -> (Relational.qUnpivot _),
    "q_ntile" -> (Relational.qNtile _),
    "q_not_in" -> (Relational.qNotIn _),
    "q_bloom_pruned_join" -> (Relational.qBloomPrunedJoin _),
    "q_bucketed_join" -> (Relational.qBucketedJoin _),
    "q_partition_pruned" -> (Events.partitionPruned _),
    "q_deltalite_partition_pruned" -> (Events.deltaPartitionPruned _),
    "q_catalog_table_sql" -> (Events.catalogSql _),
    "q_dml_sql" -> (Events.dmlSql _),
    "q_session_catalog_sql" -> (Events.sessionCatalogSql _),
    "q_dml_merge_multi" -> (Events.dmlMergeMulti _),
    "q_copy_into" -> (Events.copyIntoSql _),
    "q_sketch_setops" -> (Events.sketchSetops _),
    "q_string_funcs" -> (Text.stringFuncs _),
    "q_higher_order" -> (Text.higherOrder _),
    "q_quantile_sketch" -> (Relational.qQuantileSketch _),
    "q_hash_split" -> (Text.hashSplit _),
    "q_weighted_sample" -> (Text.weightedSample _),
    // GROUP BY ALL through the verbatim two-engine catalog path
    "q_group_by_all" -> ((s: SparkSession, dir: String) =>
      GraftSession.withTables(s, dir).sql(GroupByAllQuery)),
    "q_decontaminate" -> (Text.decontaminate _),
    "q_gopher_repetition" -> (Text.gopherRepetition _),
    "q_inverted_index" -> (Text.invertedIndex _),
    "q_bm25" -> (Text.bm25 _),
    // RRF fusion of the bm25 and cosine rankings — two bounded top-50
    // lists, one tiny full-outer rank join, no corpus re-scan
    "q_hybrid_rrf" -> (Text.hybridRrf _),
    "q_pack_sequences" -> (Text.packSequences _),
    "q_token_freq" -> (Text.tokenFreq _),
    "q_length_histogram" -> (Text.lengthHistogram _),
    "dedup_clusters" -> (Text.dedupClusters _),
    "q_expectations" -> (Etl.expectations _),
    "q_scd2" -> (Etl.scd2 _),
    "q_pagerank" -> (Graph.qPagerank _),
    "q_triangles" -> (Graph.qTriangles _),
    "q_bfs_levels" -> (Graph.qBfsLevels _),
    "q_corr_stats" -> (Stats.qCorrStats _),
    "q_xcorr" -> (Stats.qXcorr _),
    "q_entropy" -> (Stats.qEntropy _),
    "q_skyline" -> (Stats.qSkyline _),
    "q_mode" -> (Stats.qMode _),
    "q_interval_overlap" -> (Stats.qIntervalOverlap _),
    "q_rolling_distinct" -> (Stats.qRollingDistinct _),
    "q_domain_mix" -> (Text.domainMix _),
    "q_label_encode" -> (Text.labelEncode _),
    "q_chunk" -> (Text.chunk _),
    "q_quality_band" -> (Text.qualityBand _),
    "q_self_dedup_lines" -> (Text.selfDedupLines _),
    "q_feature_hash" -> (Text.featureHash _),
    "text_dup_spans" -> (Text.dupSpans _),
    "text_dup_spans_exact" -> (Text.exactDupSpans _),
    "text_span_removal_exact" -> (Text.exactSpanRemoval _),
    "text_span_removal" -> (Text.spanRemoval _),
    "text_winnow_fp" -> (Text.winnowFp _),
    "text_bigram_nll" -> (Text.bigramNll _),
    "q_cooccur_pmi" -> (Text.cooccurPmi _),
    "q_vocab_growth" -> (Text.vocabGrowth _),
    // rows-only: the BPE merge loop is not SQL-expressible; exact
    // segmentation semantics are spec'd in BpeSpec
    "q_bpe" -> (Text.bpe _),
    "q_domain_upsample" -> (Text.domainUpsample _),
    // recursive CTE through the same verbatim-SQL catalog path as
    // q_sql_catalog: one string, both engines
    "q_recursive_cte" -> ((s: SparkSession, dir: String) =>
      GraftSession.withTables(s, dir).sql(RecursiveCteQuery)),
    // the analyst path: SQL text against the registered view catalog
    "q_sql_catalog" -> ((s: SparkSession, dir: String) =>
      GraftSession.withTables(s, dir).sql(SqlCatalogQuery)),
    // correlated LATERAL subquery (top-N per outer row) through the
    // same verbatim-SQL path — one string, both engines
    "q_lateral_topn" -> ((s: SparkSession, dir: String) =>
      GraftSession.withTables(s, dir).sql(LateralTopNQuery)),
    "etl_json_extract" -> (Etl.jsonExtract _),
    "etl_dedup_append" -> (Etl.dedupAppend _),
    // zero-copy adoption of a real _delta_log (multi-commit, remove
    // applied) — the migration path for the reference's own format
    "etl_convert_from_delta" -> (Etl.convertFromDelta _),
    "etl_convert_from_delta_part" -> (Etl.convertFromDeltaPartitioned _),
    "etl_convert_from_delta_dv" -> (Etl.convertFromDeltaDv _),
    "text_token_count" -> (Text.tokenCount _),
    "text_quality" -> (Text.quality _),
    // learned quality tier, closed-form member: teacher score in
    // integer micros, integer sufficient statistics, two IEEE
    // divisions — fit AND scoring re-derive exactly in SQL (oracled);
    // the general hashed-feature d<=64 ridge is
    // Curation.fitQualityRidge, spec'd vs a driver reference fit
    "q_quality_learned" -> (Text.qualityLearned _),
    "text_langid" -> (Text.langid _),
    "text_fingerprint" -> (Text.fingerprint _),
    "dedup_exact" -> (Text.dedupExact _),
    "dedup_minhash_lsh" -> (Text.dedupMinhash _),
    "dedup_simhash" -> (Text.dedupSimhash _),
    "dedup_ngram_jaccard" -> (Text.dedupNgramJaccard _),
    "dedup_embedding" -> (Text.dedupEmbedding _),
    // SemDeDup: embedding-space semantic dedup, md5-centroid variant —
    // assignment + cluster-bounded pruning + min-id survivor re-derive
    // in SQL (oracled); trained-centroid path spec'd in SimilaritySpec
    "dedup_semantic" -> (Vectors.dedupSemantic _),
    "ann_bruteforce_topk" -> (Vectors.annBruteForce _),
    // md5-plane variant: the full LSH chain re-derives in SQL (oracled)
    "ann_lsh_topk" -> (Vectors.annLsh _),
    // md5-centroid variant: assignment + probe + rank re-derive in SQL
    // (oracled); trained-quantizer path recall-spec'd in SimilaritySpec
    "ann_ivf_topk" -> (Vectors.annIvf _),
    "knn_graph" -> (Vectors.knnGraph _),
    // md5-codebook variant: encode + approx-score + shortlist + re-rank
    // re-derive in SQL (oracled); trained-codebook path recall-spec'd
    // in SimilaritySpec
    "ann_pq_topk" -> (Vectors.annPq _),
    // graph tier, invariant-twin oracled: planted-twin queries make
    // exact top-k the SQL-derivable truth; recall at approximate
    // settings stays spec'd in HnswSpec
    "ann_hnsw_topk" -> (Vectors.annHnsw _),
    // Artetxe & Schwenk ratio-margin bitext mining: micro-quantized
    // cosines + integer k-sums + one-division margin — the whole mined
    // ranking re-derives in SQL (oracled); planted translation twins
    // rank 1 (MarginMiningSpec)
    "q_margin_mining" -> (Vectors.marginMining _),
    // the ANN-composed corpus-scale tier: whole source side mined
    // through sharded HNSW probes (no query broadcast); exhaustive ef
    // at gate scales makes the same SQL derivation the oracle
    "q_margin_mining_ann" -> (Vectors.marginMiningAnn _),
    "q_events_tumbling" -> (Events.tumbling _),
    "q_retention" -> (Events.retention _),
    "q_funnel" -> (Events.funnel _),
    "q_events_sessionize" -> (Events.sessionize _),
    "q_asof_join" -> (Temporal.qAsofJoin _),
    "q_heavy_hitters" -> (Events.heavyHitters _),
    "q_distinct_sketch" -> (Events.distinctSketch _),
    "q_countmin" -> (Events.countMin _),
    "q_sketch_reagg" -> (Events.sketchReagg _),
    // flagship composition: annotate -> filter -> exact dedup -> LSH
    // near-dedup, all library operators; oracled end-to-end (the LSH
    // stage only proposes candidates — all-pairs DuckDB ground truth
    // agrees, see the dedup_ngram_jaccard miss-probability note) and
    // semantics additionally spec'd in CurationSpec
    "pipeline_curate" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      graft.ops.Curation.curate(graft.Tables.documents(s, dir),
        "text", "doc_id", minQuality = 0.3,
        langs = Seq("en", "de", "fr", "es"), jaccard = 0.8)
        .select(col("doc_id"), col("lang_pred"), col("quality"),
          col("n_tokens"))
        .orderBy(col("doc_id"))
    }),
    "q_range_join" -> (Temporal.qRangeJoin _),
    "q_events_user_stats" -> (Events.userStats _),
    "q_latest_per_key" -> (Events.latestPerKey _),
    "q_modern_aggs" -> (Events.modernAggs _),
    "q_pivot_events" -> (Events.pivotDaily _),
    "mm_image_decode" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      graft.ops.Multimodal.decodeImages(
        graft.ops.Multimodal.syntheticImages(s, n = 24))
        .toDF()
        .select(col("id"), col("width"), col("height"), col("n_pixels"),
          col("mean_r"), col("mean_g"), col("mean_b"))
        .orderBy(col("id"))
    }),
    "mm_video_decode" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      graft.ops.Multimodal.decodeVideo(
        graft.ops.Multimodal.syntheticVideo(s, n = 12), sampleEvery = 2)
        .toDF()
        .select(col("id"), col("frame"), col("n_frames"), col("width"),
          col("height"), col("mean_gray"))
        .orderBy(col("id"), col("frame"))
    }),
    "mm_audio_decode" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      graft.ops.Multimodal.decodeAudio(
        graft.ops.Multimodal.syntheticAudio(s, n = 24))
        .toDF()
        .select(col("id"), col("sample_rate"), col("n_samples"),
          col("mean_amp"), col("peak"), col("rms"))
        .orderBy(col("id"))
    }),
    // image near-dup detection: planted byte-identical copies (ids
    // k+100 for k ≡ 0 mod 6) must land in the same perceptual-hash
    // bucket as their originals — the multimodal dedup pass
    "mm_image_phash" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      import s.implicits._
      val base = graft.ops.Multimodal.syntheticImages(s, n = 24)
      val copies = base.filter(_.id % 6 == 0)
        .map(r => r.copy(id = r.id + 100))
      graft.ops.Multimodal.imagePhash(base.union(copies))
        .toDF()
        .groupBy(col("phash"))
        .agg(count(lit(1)).as("n_images"),
          concat_ws(",", sort_array(collect_list(col("id")))).as("ids"))
        .orderBy(col("phash"))
    }),
    // video near-dup detection: per-frame phash over REAL decoded GIF
    // frames; planted byte-identical copies (ids k+100, k ≡ 0 mod 4)
    // share every sampled frame hash with their originals — the
    // frame-level dedup join of a video corpus pipeline
    "mm_frame_dedup" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      import s.implicits._
      val base = graft.ops.Multimodal.syntheticVideo(s, n = 12)
      val copies = base.filter(_.id % 4 == 0)
        .map(r => r.copy(id = r.id + 100))
      val fp = graft.ops.Multimodal
        .videoFramePhash(base.union(copies), sampleEvery = 2).toDF()
      val a = fp.select($"id".as("video_a"), $"frame", $"phash")
      val b = fp.select($"id".as("video_b"), $"frame", $"phash")
      a.join(b, Seq("frame", "phash"))
        .filter($"video_a" < $"video_b")
        .groupBy($"video_a", $"video_b")
        .agg(count(lit(1)).as("n_shared"))
        .filter($"n_shared" >= 2)
        .orderBy($"video_a", $"video_b")
    }),
    "mm_binary_meta" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      graft.ops.Multimodal.decodeFeatures(
        graft.ops.Multimodal.fromDocuments(graft.Tables.documents(s, dir)))
        .groupBy(col("modality"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("n_bytes")).as("total_bytes"))
        .orderBy(col("modality"))
    }),
    "q_semi_join" -> (Relational.qSemiJoin _),
    "q_gaps_islands" -> (Events.gapsIslands _),
    "q_coverage" -> (Events.coverage _),
    "q_fuzzy_join" -> (Text.fuzzyPairs _),
    "q_attribution" -> (Temporal.qAttribution _),
    "q_rank_stats" -> (Relational.qRankStats _),
    "q_string_agg" -> (Relational.qStringAgg _),
    "q_regex_extract" -> (Text.regexExtract _),
    // the full pretrain tail: curate -> chunk -> greedy pack, one
    // manifest row per (lang, 2048-token training bin)
    "pipeline_pretrain" -> ((s: SparkSession, dir: String) => {
      val curated = graft.ops.Curation.curate(
        graft.Tables.documents(s, dir), "text", "doc_id",
        minQuality = 0.3, langs = Seq("en", "de", "fr", "es"),
        jaccard = 0.8)
      graft.ops.Curation.pretrainPack(curated, "text", "doc_id",
        "lang_pred")
    }),
  )

  /** Runs verbatim in Spark SQL (via GraftSession.withTables views) and
    * in DuckDB — one string, two engines, same answer.
    */
  private val SqlCatalogQuery =
    """SELECT n_name, COUNT(*) AS n_supp,
      |  CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Recursive CTE (Spark 4's UnionLoop): nation keys as a binary-tree
    * hierarchy (parent of k = floor((k-1)/2)), walked root→leaf with
    * depth and materialized path. Runs verbatim in both engines.
    */
  /** Correlated LATERAL subquery — the "top-N per outer row" idiom
    * analysts reach for before window functions. Spark decorrelates it
    * into a ranked join (DecorrelateInnerQuery handles the correlated
    * LIMIT); values pass through untouched so the doubles hash-match.
    */
  private val LateralTopNQuery =
    """SELECT n_name, s_name, s_acctbal
      |FROM nation, LATERAL (
      |  SELECT s_name, s_acctbal FROM supplier
      |  WHERE s_nationkey = n_nationkey
      |  ORDER BY s_acctbal DESC, s_name LIMIT 2)
      |ORDER BY n_name, s_acctbal DESC, s_name""".stripMargin

  /** GROUP BY ALL — the modern analyst shorthand (group on every
    * non-aggregate select item), supported verbatim by both engines.
    */
  private val GroupByAllQuery =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ALL
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  private val RecursiveCteQuery =
    """WITH RECURSIVE hier(node, parent, depth, path) AS (
      |  SELECT n_nationkey, CAST(NULL AS INTEGER), CAST(0 AS INTEGER),
      |    CAST(n_nationkey AS STRING)
      |  FROM nation WHERE n_nationkey = 0
      |  UNION ALL
      |  SELECT c.n_nationkey, h.node, h.depth + 1,
      |    h.path || '/' || CAST(c.n_nationkey AS STRING)
      |  FROM nation c JOIN hier h
      |    ON CAST(floor((c.n_nationkey - 1) / 2.0) AS INTEGER) = h.node
      |  WHERE c.n_nationkey > 0)
      |SELECT node, parent, depth, path FROM hier ORDER BY node""".stripMargin

  /** DuckDB-dialect oracle for each key in `queries`. */
  /** Shared CTE chain re-deriving the curation pipeline (annotate →
    * filter → min-id exact dedup → all-pairs 3-gram Jaccard losers) —
    * the common prefix of the `pipeline_curate` and `pipeline_pretrain`
    * oracles, kept in one place so the two can never drift.
    */
  private val CurateCtes: String =
    """WITH t AS (
      |  SELECT doc_id, text,
      |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk,
      |    length(text) AS n_chars,
      |    CASE WHEN regexp_replace(text, '^\s+|\s+$', '', 'g') = '' THEN 0
      |         ELSE len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) END AS ntok,
      |    len(regexp_extract_all(text, '[[:punct:]]')) AS npunct,
      |    len(regexp_extract_all(text, '[A-Z]')) AS nupper
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id, text, tk, CAST(ntok AS BIGINT) AS n_tokens,
      |    CAST(len(list_filter(tk, x -> x IN ('the','and','of','to','in'))) AS BIGINT) AS s_en,
      |    CAST(len(list_filter(tk, x -> x IN ('el','la','los','de','que'))) AS BIGINT) AS s_es,
      |    CAST(len(list_filter(tk, x -> x IN ('der','die','und','das','ist'))) AS BIGINT) AS s_de,
      |    CAST(len(list_filter(tk, x -> x IN ('le','les','et','dans','est'))) AS BIGINT) AS s_fr,
      |    CAST(len(list_filter(tk, x -> x IN ('de5','shi4','le5','zai4','he2'))) AS BIGINT) AS s_zh,
      |    0.4 * (CASE WHEN ntok = 0 THEN 0.0 ELSE
      |      CAST(len(list_filter(tk, x -> x IN ('the','a','an','and','of','to','in','is','it','that'))) AS DOUBLE) / ntok END)
      |    + 0.3 * (1.0 - CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(npunct AS DOUBLE) / n_chars END)
      |    + 0.2 * least(1.0, CAST(ntok AS DOUBLE) / 100.0)
      |    + 0.1 * (1.0 - CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(nupper AS DOUBLE) / n_chars END) AS quality
      |  FROM t),
      |lang AS (
      |  SELECT *, CASE WHEN greatest(s_en, s_es, s_de, s_fr, s_zh) = 0 THEN 'und'
      |       WHEN s_en = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'en'
      |       WHEN s_es = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'es'
      |       WHEN s_de = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'de'
      |       WHEN s_fr = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'fr'
      |       WHEN s_zh = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'zh'
      |       ELSE 'und' END AS lang_pred
      |  FROM scored),
      |filtered AS (
      |  SELECT doc_id, text, tk, lang_pred, quality, n_tokens FROM lang
      |  WHERE lang_pred IN ('en','de','fr','es') AND quality >= 0.3),
      |exact AS (
      |  SELECT doc_id, text, tk, lang_pred, quality, n_tokens FROM (
      |    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS keep
      |    FROM filtered) WHERE doc_id = keep),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
      |         ELSE list_transform(generate_series(1, len(tk) - 2), i -> array_to_string(tk[i:i+2], ' ')) END)) AS sh
      |  FROM exact),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |losers AS (
      |  SELECT DISTINCT id_b FROM pairs
      |  JOIN sizes na ON na.doc_id = id_a
      |  JOIN sizes nb ON nb.doc_id = id_b
      |  WHERE CAST(common AS DOUBLE) / (na.n + nb.n - common) >= 0.8)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_semi_join" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_cust
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_gaps_islands" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events),
        |g AS (SELECT user_id, day,
        |        day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |          ORDER BY day) AS INTEGER) AS grp
        |      FROM days)
        |SELECT user_id, MIN(day) AS start_day, MAX(day) AS end_day,
        |  CAST(COUNT(*) AS BIGINT) AS n_days
        |FROM g GROUP BY user_id, grp HAVING COUNT(*) >= 3
        |ORDER BY user_id, start_day""".stripMargin,
    "q_coverage" ->
      """WITH e AS (
        |  SELECT user_id,
        |    CAST(COUNT(DISTINCT event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS r,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS BIGINT) AS rn
        |  FROM events),
        |m AS (SELECT user_id, MAX(r) AS n_types FROM e GROUP BY user_id)
        |SELECT e.user_id, m.n_types, MIN(e.rn) AS events_to_cover
        |FROM e JOIN m ON e.user_id = m.user_id AND e.r = m.n_types
        |GROUP BY e.user_id, m.n_types ORDER BY e.user_id""".stripMargin,
    "q_fuzzy_join" ->
      """WITH d AS (
        |  SELECT doc_id, substr(text, 1, 80) AS head, substr(text, 1, 12) AS blk
        |  FROM documents)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  round(jaro_winkler_similarity(a.head, b.head), 6) AS sim
        |FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |WHERE round(jaro_winkler_similarity(a.head, b.head), 6) >= 0.92
        |ORDER BY a_id, b_id""".stripMargin,
    "q_string_agg" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  CAST(COUNT(*) AS BIGINT) AS n_nations
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_regex_extract" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\b[aeiou][a-z]{4,}\b')) AS BIGINT)
        |    AS n_vowel_words,
        |  regexp_extract(text, '\b[aeiou][a-z]{4,}\b') AS first_hit
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_attribution" ->
      """WITH c AS (SELECT user_id, ts AS click_ts, event_id AS click_id
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts AS purchase_ts, event_id AS purchase_id,
        |        value AS amount
        |      FROM events WHERE event_type = 'purchase'),
        |b AS (SELECT p.purchase_id, c.click_id, c.click_ts,
        |        ROW_NUMBER() OVER (PARTITION BY p.purchase_id
        |          ORDER BY c.click_ts DESC, c.click_id DESC) AS rn
        |      FROM p JOIN c ON p.user_id = c.user_id
        |        AND c.click_ts <= p.purchase_ts
        |        AND c.click_ts >= p.purchase_ts - INTERVAL 60 MINUTE)
        |SELECT p.user_id, p.purchase_id, p.amount, b.click_id, b.click_ts
        |FROM p LEFT JOIN (SELECT * FROM b WHERE rn = 1) b USING (purchase_id)
        |ORDER BY purchase_id""".stripMargin,
    "q_rank_stats" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM orders WHERE o_custkey <= 20
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_sql_catalog" -> SqlCatalogQuery,
    "q_recursive_cte" -> RecursiveCteQuery,
    "q_lateral_topn" -> LateralTopNQuery,
    "q_group_by_all" -> GroupByAllQuery,
    "q_weighted_sample" ->
      """WITH d AS (
        |  SELECT source, doc_id, GREATEST(CAST(n_chars AS BIGINT), 1) AS w,
        |    (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) + 1)
        |      / 4503599627370496.0 AS u
        |  FROM documents),
        |r AS (SELECT source, doc_id, w,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY source
        |          ORDER BY ln(u) / w DESC, doc_id) AS BIGINT) AS rank
        |      FROM d)
        |SELECT source, rank, doc_id, w FROM r WHERE rank <= 3
        |ORDER BY source, rank""".stripMargin,
    "q_mode" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
        |  FROM lineitem GROUP BY l_returnflag, l_quantity)
        |SELECT l_returnflag, l_quantity AS mode_qty, CAST(cnt AS BIGINT) AS n_mode
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |        ORDER BY cnt DESC, l_quantity) AS r FROM c)
        |WHERE r = 1 ORDER BY l_returnflag""".stripMargin,
    "q_expectations" ->
      """WITH m AS (
        |  SELECT
        |    SUM(CASE WHEN l_discount <= 0.08 THEN 1 ELSE 0 END) AS p1,
        |    SUM(CASE WHEN l_extendedprice >= 5000.0 THEN 1 ELSE 0 END) AS p2,
        |    SUM(CASE WHEN l_quantity > 0.0 THEN 1 ELSE 0 END) AS p3,
        |    SUM(CASE WHEN l_quantity <= 45.0 THEN 1 ELSE 0 END) AS p4,
        |    SUM(CASE WHEN l_tax < 0.06 THEN 1 ELSE 0 END) AS p5,
        |    COUNT(*) AS n
        |  FROM lineitem)
        |SELECT 'discount_capped' AS rule, CAST(p1 AS BIGINT) AS n_pass,
        |  CAST(n - p1 AS BIGINT) AS n_fail FROM m
        |UNION ALL SELECT 'price_floor', CAST(p2 AS BIGINT), CAST(n - p2 AS BIGINT) FROM m
        |UNION ALL SELECT 'qty_positive', CAST(p3 AS BIGINT), CAST(n - p3 AS BIGINT) FROM m
        |UNION ALL SELECT 'qty_under_46', CAST(p4 AS BIGINT), CAST(n - p4 AS BIGINT) FROM m
        |UNION ALL SELECT 'tax_under_6pct', CAST(p5 AS BIGINT), CAST(n - p5 AS BIGINT) FROM m
        |ORDER BY rule""".stripMargin,
    "q_scd2" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |k AS (SELECT user_id, ts, event_id, event_type FROM o
        |      WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, ts AS valid_from,
        |  lead(ts) OVER w AS valid_to,
        |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
        |  lead(ts) OVER w IS NULL AS is_current,
        |  event_type
        |FROM k
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, valid_from""".stripMargin,
    "q_corr_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 12) AS corr,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS slope,
        |  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS intercept
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_xcorr" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n
        |               FROM events GROUP BY 1, 2),
        |c AS (SELECT day, n AS x FROM daily WHERE event_type = 'click'),
        |p AS (SELECT day, n AS y FROM daily WHERE event_type = 'purchase'),
        |sh AS (SELECT g.lag AS lag, c.day + g.lag * INTERVAL '1' DAY AS pday, c.x
        |       FROM c CROSS JOIN generate_series(-3, 3) AS g(lag)),
        |m AS (SELECT lag, COUNT(*) AS n,
        |        CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |        CAST(SUM(x * y) AS DOUBLE) AS sxy,
        |        CAST(SUM(x * x) AS DOUBLE) AS sxx,
        |        CAST(SUM(y * y) AS DOUBLE) AS syy
        |      FROM sh JOIN p ON p.day = sh.pday GROUP BY lag)
        |SELECT lag, n,
        |  round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 12) AS xcorr
        |FROM m ORDER BY lag""".stripMargin,
    "q_entropy" ->
      """WITH cl AS (
        |  SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY source, lang),
        |t AS (SELECT source, c, SUM(c) OVER (PARTITION BY source) AS n FROM cl),
        |q AS (SELECT source, n,
        |        c * CAST(floor(ln(CAST(n AS DOUBLE) / c) * 1e6) AS BIGINT) AS term
        |      FROM t)
        |SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs, COUNT(*) AS n_langs,
        |  CAST(SUM(term) AS DOUBLE) / (CAST(MAX(n) AS BIGINT) * 1e6) AS entropy_nats
        |FROM q GROUP BY source ORDER BY source""".stripMargin,
    "q_skyline" ->
      """WITH p AS (SELECT DISTINCT CAST(p_retailprice AS DECIMAL(12,2)) AS x,
        |             CAST(p_size AS BIGINT) AS y FROM part)
        |SELECT CAST(x AS DOUBLE) AS price, y AS size FROM p a
        |WHERE NOT EXISTS (SELECT 1 FROM p b
        |  WHERE b.x <= a.x AND b.y <= a.y AND (b.x < a.x OR b.y < a.y))
        |ORDER BY price, size""".stripMargin,
    "q_interval_overlap" ->
      """WITH b AS (
        |  SELECT o_orderpriority AS prio, o_orderdate AS t, 1 AS d FROM orders
        |  UNION ALL
        |  SELECT o_orderpriority, o_orderdate + INTERVAL '30' DAY, -1 FROM orders),
        |n AS (SELECT prio, t, SUM(d) AS net FROM b GROUP BY prio, t),
        |seg AS (SELECT prio, t, SUM(net) OVER (PARTITION BY prio ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM n),
        |pk AS (SELECT prio, t, cum, MAX(cum) OVER (PARTITION BY prio) AS peak FROM seg)
        |SELECT prio, CAST(MAX(peak) AS BIGINT) AS peak, MIN(t) AS peak_from
        |FROM pk WHERE cum = peak GROUP BY prio ORDER BY prio""".stripMargin,
    "q_rolling_distinct" ->
      """WITH ud AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
        |dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY day),
        |c AS (SELECT ud.day + g.o * INTERVAL '1' DAY AS day, ud.user_id
        |      FROM ud CROSS JOIN generate_series(0, 6) AS g(o)),
        |wau AS (SELECT day, COUNT(DISTINCT user_id) AS wau FROM c GROUP BY day)
        |SELECT dau.day AS day, dau, wau,
        |  CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
        |FROM dau JOIN wau ON dau.day = wau.day ORDER BY day""".stripMargin,
    "q_triangles" ->
      """WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sk FROM lineitem),
        |e0 AS (SELECT DISTINCT a.sk AS u, b.sk AS v
        |       FROM ps a JOIN ps b ON a.p = b.p AND a.sk < b.sk),
        |e AS (SELECT u, v FROM e0 WHERE substring(md5(
        |        CAST(u AS VARCHAR) || ',' || CAST(v AS VARCHAR)), 1, 2) < '10'),
        |und AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT u AS n, COUNT(*) AS d FROM und GROUP BY u),
        |tri AS (SELECT COUNT(*) AS n_triangles FROM e e1
        |        JOIN e e2 ON e2.u = e1.v
        |        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |sh AS (SELECT COUNT(*) AS n_nodes,
        |         CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
        |ec AS (SELECT COUNT(*) AS n_edges FROM e)
        |SELECT n_nodes, n_edges, n_wedges, n_triangles,
        |  (3.0 * n_triangles) / n_wedges AS gcc
        |FROM sh, ec, tri""".stripMargin,
    "q_bfs_levels" ->
      """WITH RECURSIVE
        |ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sk FROM lineitem),
        |e0 AS (SELECT DISTINCT a.sk AS u, b.sk AS v
        |       FROM ps a JOIN ps b ON a.p = b.p AND a.sk < b.sk),
        |e AS (SELECT u, v FROM e0 WHERE substring(md5(
        |        CAST(u AS VARCHAR) || ',' || CAST(v AS VARCHAR)), 1, 2) < '10'),
        |und AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        |walk(node, lvl) AS (
        |  SELECT (SELECT MIN(u) FROM e), 0
        |  UNION
        |  SELECT und.v, walk.lvl + 1 FROM walk JOIN und ON und.u = walk.node
        |  WHERE walk.lvl < 6)
        |SELECT node, CAST(MIN(lvl) AS BIGINT) AS lvl FROM walk
        |GROUP BY node ORDER BY node""".stripMargin,
    "q_pagerank" ->
      """WITH edges AS (
        |  SELECT DISTINCT l_suppkey AS src, o_custkey + 100000 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
        |c AS (SELECT COUNT(*) AS n FROM nodes),
        |pr0 AS (SELECT node, 1000000000000 // n AS pr FROM nodes, c),
        |i1 AS (SELECT dst AS node, CAST(SUM(pr // outdeg) AS BIGINT) AS f
        |       FROM edges JOIN deg USING (src) JOIN pr0 ON pr0.node = edges.src
        |       GROUP BY dst),
        |pr1 AS (SELECT nodes.node,
        |         1000000000000 * 15 // 100 // n + COALESCE(f, 0) * 85 // 100 AS pr
        |        FROM nodes CROSS JOIN c LEFT JOIN i1 ON i1.node = nodes.node),
        |i2 AS (SELECT dst AS node, CAST(SUM(pr // outdeg) AS BIGINT) AS f
        |       FROM edges JOIN deg USING (src) JOIN pr1 ON pr1.node = edges.src
        |       GROUP BY dst),
        |pr2 AS (SELECT nodes.node,
        |         1000000000000 * 15 // 100 // n + COALESCE(f, 0) * 85 // 100 AS pr
        |        FROM nodes CROSS JOIN c LEFT JOIN i2 ON i2.node = nodes.node),
        |i3 AS (SELECT dst AS node, CAST(SUM(pr // outdeg) AS BIGINT) AS f
        |       FROM edges JOIN deg USING (src) JOIN pr2 ON pr2.node = edges.src
        |       GROUP BY dst),
        |pr3 AS (SELECT nodes.node,
        |         1000000000000 * 15 // 100 // n + COALESCE(f, 0) * 85 // 100 AS pr
        |        FROM nodes CROSS JOIN c LEFT JOIN i3 ON i3.node = nodes.node)
        |SELECT node, pr FROM pr3 ORDER BY pr DESC, node LIMIT 100""".stripMargin,
    "q_domain_mix" ->
      """WITH d AS (
        |  SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |  FROM documents),
        |cw AS (
        |  SELECT source, dl,
        |    SUM(dl) OVER (PARTITION BY source ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d)
        |SELECT source, COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS n_tokens,
        |  CAST(MAX(cum) AS BIGINT) AS cum_at_stop
        |FROM cw WHERE cum - dl < 800
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_self_dedup_lines" ->
      """WITH s AS (SELECT doc_id, string_split(text, '. ') AS lines FROM documents),
        |l AS (SELECT doc_id, unnest(lines) AS line,
        |        generate_subscripts(lines, 1) AS pos FROM s),
        |f AS (SELECT doc_id, line, MIN(pos) AS p FROM l GROUP BY doc_id, line),
        |nl AS (SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines FROM s)
        |SELECT f.doc_id, nl.n_lines, COUNT(*) AS n_kept,
        |  string_agg(f.line, '. ' ORDER BY f.p) AS cleaned
        |FROM f JOIN nl ON f.doc_id = nl.doc_id
        |GROUP BY f.doc_id, nl.n_lines
        |ORDER BY f.doc_id""".stripMargin,
    "q_feature_hash" ->
      """SELECT doc_id,
        |  CAST(list_sum(list_transform(string_split(token, ''), c -> ascii(c))) % 64 AS BIGINT) AS bucket,
        |  COUNT(*) AS n
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t
        |GROUP BY doc_id, bucket
        |ORDER BY doc_id, bucket""".stripMargin,
    "text_dup_spans" ->
      """WITH spans AS (
        |  SELECT doc_id,
        |    CASE WHEN length(text) >= 64
        |      THEN substring(text, CAST(i * 16 + 1 AS INT), 64)
        |      ELSE text END AS span
        |  FROM (
        |    SELECT doc_id, text,
        |      unnest(range(0, CASE WHEN length(text) >= 64
        |        THEN CAST(floor((length(text) - 64) / 16) AS BIGINT) + 1
        |        ELSE 1 END)) AS i
        |    FROM documents)),
        |h AS (SELECT doc_id, md5(span) AS h FROM spans),
        |dup AS (SELECT h FROM h GROUP BY h HAVING count(DISTINCT doc_id) >= 2)
        |SELECT h.doc_id, COUNT(*) AS n_spans, COUNT(dup.h) AS n_dup
        |FROM h LEFT JOIN dup ON h.h = dup.h
        |GROUP BY h.doc_id ORDER BY h.doc_id""".stripMargin,
    "text_dup_spans_exact" ->
      """WITH pos AS (
        |  SELECT doc_id, text,
        |    unnest(range(0, length(text) - 39)) AS s
        |  FROM documents WHERE length(text) >= 40),
        |g AS (SELECT doc_id, CAST(s AS INT) AS s,
        |        md5(substring(text, CAST(s + 1 AS INT), 40)) AS h
        |      FROM pos),
        |dup AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |fl AS (SELECT doc_id, s, s + 40 AS e FROM g JOIN dup USING (h)),
        |iv AS (
        |  SELECT doc_id, s, e,
        |    CASE WHEN s <= COALESCE(MAX(e) OVER (
        |        PARTITION BY doc_id ORDER BY s
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |      THEN 0 ELSE 1 END AS ng
        |  FROM fl),
        |iv2 AS (SELECT doc_id, e, s,
        |          SUM(ng) OVER (PARTITION BY doc_id ORDER BY s) AS grp
        |        FROM iv),
        |m AS (SELECT doc_id, grp, MIN(s) AS gs, MAX(e) AS ge
        |      FROM iv2 GROUP BY doc_id, grp)
        |SELECT doc_id, COUNT(*) AS n_spans,
        |  CAST(SUM(ge - gs) AS BIGINT) AS dup_chars
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_span_removal" ->
      """WITH win AS (
        |  SELECT doc_id, text, CAST(i * 16 AS INT) AS s
        |  FROM (SELECT doc_id, text,
        |          unnest(range(0, CASE WHEN length(text) >= 64
        |            THEN CAST(floor((length(text) - 64) / 16) AS BIGINT) + 1
        |            ELSE 0 END)) AS i
        |        FROM documents)),
        |h AS (SELECT doc_id, s, md5(substring(text, s + 1, 64)) AS h FROM win),
        |dup AS (SELECT h FROM h GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |fl AS (SELECT doc_id, s, s + 64 AS e FROM h JOIN dup USING (h)),
        |m AS (
        |  SELECT doc_id, s, e,
        |    CASE WHEN s <= coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |    THEN 0 ELSE 1 END AS ng
        |  FROM fl),
        |g AS (SELECT doc_id, s, e,
        |        sum(ng) OVER (PARTITION BY doc_id ORDER BY s) AS grp FROM m),
        |iv AS (SELECT doc_id, min(s) AS s, max(e) AS e FROM g GROUP BY doc_id, grp),
        |piv AS (SELECT doc_id, s, e,
        |          coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS pe
        |        FROM iv),
        |frag AS (
        |  SELECT doc_id, pe AS ks, s - pe AS klen, pe AS ord FROM piv
        |  UNION ALL
        |  SELECT mx.doc_id, mx.me AS ks, length(d.text) - mx.me AS klen, mx.me AS ord
        |  FROM (SELECT doc_id, max(e) AS me FROM iv GROUP BY doc_id) mx
        |  JOIN documents d USING (doc_id)),
        |cleaned AS (
        |  SELECT f.doc_id,
        |    string_agg(substring(d.text, f.ks + 1, f.klen), '' ORDER BY f.ord)
        |      AS ctext
        |  FROM frag f JOIN documents d USING (doc_id) GROUP BY f.doc_id)
        |SELECT d.doc_id, length(d.text) AS n_chars,
        |  CAST(coalesce(length(d.text) - length(c.ctext), 0) AS BIGINT) AS n_removed,
        |  md5(coalesce(c.ctext, d.text)) AS cleaned_md5
        |FROM documents d LEFT JOIN cleaned c USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "text_span_removal_exact" ->
      """WITH pos AS (
        |  SELECT doc_id, text, unnest(range(0, length(text) - 39)) AS i
        |  FROM documents WHERE length(text) >= 40),
        |h AS (SELECT doc_id, CAST(i AS INT) AS s,
        |        md5(substring(text, CAST(i + 1 AS INT), 40)) AS h
        |      FROM pos),
        |dup AS (SELECT h FROM h GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |fl AS (SELECT doc_id, s, s + 40 AS e FROM h JOIN dup USING (h)),
        |m AS (
        |  SELECT doc_id, s, e,
        |    CASE WHEN s <= coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |    THEN 0 ELSE 1 END AS ng
        |  FROM fl),
        |g AS (SELECT doc_id, s, e,
        |        sum(ng) OVER (PARTITION BY doc_id ORDER BY s) AS grp FROM m),
        |iv AS (SELECT doc_id, min(s) AS s, max(e) AS e FROM g GROUP BY doc_id, grp),
        |piv AS (SELECT doc_id, s, e,
        |          coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS pe
        |        FROM iv),
        |frag AS (
        |  SELECT doc_id, pe AS ks, s - pe AS klen, pe AS ord FROM piv
        |  UNION ALL
        |  SELECT mx.doc_id, mx.me AS ks, length(d.text) - mx.me AS klen, mx.me AS ord
        |  FROM (SELECT doc_id, max(e) AS me FROM iv GROUP BY doc_id) mx
        |  JOIN documents d USING (doc_id)),
        |cleaned AS (
        |  SELECT f.doc_id,
        |    string_agg(substring(d.text, CAST(f.ks + 1 AS INT), CAST(f.klen AS INT)), '' ORDER BY f.ord)
        |      AS ctext
        |  FROM frag f JOIN documents d USING (doc_id) GROUP BY f.doc_id)
        |SELECT d.doc_id, length(d.text) AS n_chars,
        |  CAST(coalesce(length(d.text) - length(c.ctext), 0) AS BIGINT) AS n_removed,
        |  md5(coalesce(c.ctext, d.text)) AS cleaned_md5
        |FROM documents d LEFT JOIN cleaned c USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "text_winnow_fp" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        |kg AS (
        |  SELECT doc_id, CAST(i AS INT) AS pos,
        |    md5(array_to_string(a[CAST(i + 1 AS INT):CAST(i + 3 AS INT)], ' ')) AS h
        |  FROM (SELECT doc_id, a, unnest(range(0, greatest(len(a) - 2, 0))) AS i
        |        FROM toks)),
        |w AS (SELECT doc_id, pos,
        |        min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mh
        |      FROM kg),
        |fp AS (SELECT DISTINCT doc_id, mh FROM w WHERE pos >= 3),
        |shared AS (SELECT mh FROM fp GROUP BY mh HAVING count(*) >= 2)
        |SELECT fp.doc_id, count(*) AS n_fp, count(shared.mh) AS n_shared
        |FROM fp LEFT JOIN shared USING (mh)
        |GROUP BY fp.doc_id ORDER BY fp.doc_id""".stripMargin,
    "text_bigram_nll" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        |bg AS (
        |  SELECT doc_id, a[CAST(i + 1 AS INT)] AS t1, a[CAST(i + 2 AS INT)] AS t2
        |  FROM (SELECT doc_id, a, unnest(range(0, greatest(len(a) - 1, 0))) AS i
        |        FROM toks)),
        |c12 AS (SELECT t1, t2, count(*) AS c12 FROM bg GROUP BY t1, t2),
        |c1 AS (SELECT t1, sum(c12) AS c1 FROM c12 GROUP BY t1),
        |lm AS (SELECT t1, t2,
        |         CAST(floor(ln(c12 / c1) * 1e6) AS BIGINT) AS lp
        |       FROM c12 JOIN c1 USING (t1))
        |SELECT bg.doc_id, count(*) AS n_bigrams,
        |  CAST(-sum(lm.lp) AS DOUBLE) / (count(*) * 1e6) AS avg_nll
        |FROM bg JOIN lm USING (t1, t2)
        |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin,
    "q_cooccur_pmi" ->
      """WITH dt AS (SELECT DISTINCT doc_id,
        |              unnest(string_split(text, ' ')) AS token FROM documents),
        |df AS (SELECT token, count(*) AS df FROM dt GROUP BY token
        |       HAVING count(*) >= 25),
        |n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        |vt AS (SELECT doc_id, token FROM dt
        |       WHERE token IN (SELECT token FROM df)),
        |pairs AS (
        |  SELECT a.token AS t1, b.token AS t2, count(*) AS c12
        |  FROM vt a JOIN vt b USING (doc_id) WHERE a.token < b.token
        |  GROUP BY 1, 2 HAVING count(*) >= 10)
        |SELECT t1, t2, c12,
        |  CAST(floor(ln(CAST(c12 AS DOUBLE) * n.n / (d1.df * d2.df)) * 1e6)
        |    AS BIGINT) AS pmi_micro
        |FROM pairs
        |JOIN df d1 ON d1.token = t1 JOIN df d2 ON d2.token = t2 CROSS JOIN n
        |ORDER BY pmi_micro DESC, t1, t2 LIMIT 100""".stripMargin,
    "q_vocab_growth" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |cnt AS (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY doc_id),
        |firsts AS (SELECT token, min(doc_id) AS doc_id FROM tok GROUP BY token),
        |newc AS (SELECT doc_id, count(*) AS n_new FROM firsts GROUP BY doc_id)
        |SELECT c.doc_id,
        |  CAST(sum(c.n_tok) OVER (ORDER BY c.doc_id) AS BIGINT) AS tokens_cum,
        |  CAST(sum(coalesce(n.n_new, 0)) OVER (ORDER BY c.doc_id) AS BIGINT)
        |    AS vocab_cum
        |FROM cnt c LEFT JOIN newc n USING (doc_id)
        |ORDER BY c.doc_id""".stripMargin,
    "q_quality_band" ->
      """WITH t AS (
        |  SELECT doc_id, lang, n_chars,
        |    CASE WHEN regexp_replace(text, '^\s+|\s+$', '', 'g') = '' THEN 0
        |         ELSE len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) END AS ntok,
        |    len(list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
        |        x -> x IN ('the','a','an','and','of','to','in','is','it','that'))) AS nstop,
        |    len(regexp_extract_all(text, '[[:punct:]]')) AS npunct,
        |    len(regexp_extract_all(text, '[A-Z]')) AS nupper
        |  FROM documents),
        |q AS (SELECT doc_id, lang,
        |  0.4 * (CASE WHEN ntok = 0 THEN 0.0 ELSE CAST(nstop AS DOUBLE) / ntok END)
        |  + 0.3 * (1.0 - CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(npunct AS DOUBLE) / n_chars END)
        |  + 0.2 * least(1.0, CAST(ntok AS DOUBLE) / 100.0)
        |  + 0.1 * (1.0 - CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(nupper AS DOUBLE) / n_chars END) AS q
        |  FROM t),
        |band AS (SELECT quantile_cont(q, 0.05) AS lo, quantile_cont(q, 0.95) AS hi FROM q)
        |SELECT lang, COUNT(*) AS n_kept, MIN(q) AS min_q, MAX(q) AS max_q
        |FROM q, band WHERE q >= lo AND q <= hi
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_domain_upsample" ->
      """WITH d AS (
        |  SELECT source, CAST(substr(source, 4) AS INTEGER) % 3 + 1 AS rep,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |  FROM documents),
        |e AS (SELECT source, rep, dl,
        |        UNNEST(generate_series(1, rep)) AS epoch FROM d)
        |SELECT source, MAX(rep) AS repeats, COUNT(*) AS n_rows,
        |  CAST(SUM(dl) AS BIGINT) AS total_tokens
        |FROM e GROUP BY source ORDER BY source""".stripMargin,
    // BPE invariant twin: losslessness (token concat == text minus
    // whitespace) and count bounds re-derived from raw text — Spark
    // computes both FROM the real encode, the oracle states them; any
    // merge/segmentation bug flips a row to false → hash mismatch.
    // Merge order and token identity are pinned by BpeSpec.
    "q_bpe" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT)
        |    AS n_nospace,
        |  true AS lossless,
        |  true AS bounded
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_chunk" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |c AS (SELECT doc_id, len(t) AS n, t,
        |        UNNEST(generate_series(0, len(t) - 1, 12)) AS start
        |      FROM d)
        |SELECT doc_id, CAST(start // 12 AS BIGINT) AS chunk_idx,
        |  CAST(LEAST(16, n - start) AS BIGINT) AS n_chunk_tokens,
        |  array_to_string(t[start + 1:start + 16], ' ') AS chunk
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    // Spark decodes REAL PNG bytes and pools luminance into a 4×4
    // aHash; the oracle recomputes the same integer hash from the
    // generator formula (16×12 → 4×3-pixel cells, cross-multiplied
    // mean compare) with no codec.
    "mm_frame_dedup" ->
      """WITH vids AS (
        |  SELECT CAST(range AS BIGINT) AS id, CAST(range AS BIGINT) AS s FROM range(12)
        |  UNION ALL
        |  SELECT CAST(range + 100 AS BIGINT), CAST(range AS BIGINT) FROM range(0, 12, 4)),
        |frs AS (SELECT range AS f FROM range(0, 8, 2)),
        |xs AS (SELECT range AS x FROM range(16)),
        |ys AS (SELECT range AS y FROM range(12)),
        |pix AS (SELECT id, f, (y // 3) * 4 + (x // 4) AS c,
        |    3 * ((s * 13 + f * 29 + x * 3 + y * 5) % 256) AS lum
        |  FROM vids, frs, xs, ys),
        |cells AS (SELECT id, f, c, CAST(SUM(lum) AS BIGINT) AS cs
        |          FROM pix GROUP BY id, f, c),
        |tot AS (SELECT id, f, CAST(SUM(cs) AS BIGINT) AS t FROM cells GROUP BY id, f),
        |bits AS (SELECT cells.id, cells.f,
        |    CAST(SUM(CASE WHEN cs * 16 > t THEN (CAST(1 AS BIGINT) << c)
        |             ELSE 0 END) AS BIGINT) AS phash
        |  FROM cells JOIN tot USING (id, f) GROUP BY cells.id, cells.f),
        |pairs AS (SELECT a.id AS video_a, b.id AS video_b
        |  FROM bits a JOIN bits b ON a.f = b.f AND a.phash = b.phash
        |  WHERE a.id < b.id)
        |SELECT video_a, video_b, COUNT(*) AS n_shared
        |FROM pairs GROUP BY video_a, video_b
        |HAVING COUNT(*) >= 2
        |ORDER BY video_a, video_b""".stripMargin,
    "mm_image_phash" ->
      """WITH imgs AS (
        |  SELECT CAST(range AS BIGINT) AS id, CAST(range AS BIGINT) AS f FROM range(24)
        |  UNION ALL
        |  SELECT CAST(range + 100 AS BIGINT), CAST(range AS BIGINT) FROM range(0, 24, 6)),
        |xs AS (SELECT range AS x FROM range(16)),
        |ys AS (SELECT range AS y FROM range(12)),
        |pix AS (SELECT id, (y // 3) * 4 + (x // 4) AS c,
        |    (f * 37 + x * 16) % 256 + (f * 11 + y * 21) % 256
        |      + (f * 53 + x + y) % 256 AS lum
        |  FROM imgs, xs, ys),
        |cells AS (SELECT id, c, CAST(SUM(lum) AS BIGINT) AS s
        |          FROM pix GROUP BY id, c),
        |tot AS (SELECT id, CAST(SUM(s) AS BIGINT) AS t FROM cells GROUP BY id),
        |bits AS (SELECT cells.id,
        |    CAST(SUM(CASE WHEN s * 16 > t THEN (CAST(1 AS BIGINT) << c)
        |             ELSE 0 END) AS BIGINT) AS phash
        |  FROM cells JOIN tot USING (id) GROUP BY cells.id)
        |SELECT phash, COUNT(*) AS n_images,
        |  array_to_string(list_sort(list(id)), ',') AS ids
        |FROM bits GROUP BY phash ORDER BY phash""".stripMargin,
    "q_label_encode" ->
      """SELECT doc_id, lang,
        |  CAST(dense_rank() OVER (ORDER BY lang) AS BIGINT) AS lang_id,
        |  source,
        |  CAST(dense_rank() OVER (ORDER BY source) AS BIGINT) AS source_id
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q11_important_stock" ->
      """WITH pp AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS val_dec
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_nationkey < 8
        |  GROUP BY l_partkey),
        |tot AS (SELECT SUM(val_dec) AS total_dec, COUNT(*) AS n_parts FROM pp)
        |SELECT l_partkey, CAST(val_dec AS DOUBLE) AS part_value
        |FROM pp, tot
        |WHERE CAST(val_dec AS DOUBLE) > CAST(total_dec AS DOUBLE) / n_parts * 2
        |ORDER BY part_value DESC, l_partkey""".stripMargin,
    "q_profile" ->
      """SELECT COUNT(*) AS n_rows,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_suppliers,
        |  COUNT(CASE WHEN l_returnflag IS NULL THEN 1 END) AS n_null_flag,
        |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  MIN(CAST(l_shipdate AS DATE)) AS min_shipdate,
        |  MAX(CAST(l_shipdate AS DATE)) AS max_shipdate
        |FROM lineitem""".stripMargin,
    "q_session_window" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, CAST(value AS DECIMAL(12,2)) AS v,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR date_diff('microsecond', lag(ts) OVER w, ts) >= 1800000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, v,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM e)
        |SELECT user_id, MIN(ts) AS t_start,
        |  MAX(ts) + INTERVAL 30 MINUTE AS t_end,
        |  COUNT(*) AS n_events, CAST(SUM(v) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sess
        |ORDER BY user_id, t_start""".stripMargin,
    "q_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1),
        |cal AS (SELECT user_id,
        |  CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d FROM span)
        |SELECT c.user_id, c.d, COALESCE(n, 0) AS n_events,
        |  last_value(sv IGNORE NULLS) OVER (PARTITION BY c.user_id ORDER BY c.d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
        |FROM cal c LEFT JOIN daily USING (user_id, d)
        |ORDER BY user_id, d""".stripMargin,
    "q_transition_matrix" ->
      """WITH t AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type, COUNT(*) AS n
        |FROM t WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type
        |ORDER BY prev_type, event_type""".stripMargin,
    "q_outliers" ->
      """WITH stats AS (
        |  SELECT event_type AS t, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv,
        |    CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS m2
        |  FROM events GROUP BY event_type),
        |st AS (
        |  SELECT t, n, mean, sqrt((m2 - n * mean * mean) / (n - 1)) AS sd
        |  FROM (SELECT t, n, sv / n AS mean, m2 FROM stats))
        |SELECT event_type, COUNT(*) AS n_outliers, MIN(value) AS min_v,
        |  MAX(value) AS max_v,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_v
        |FROM events JOIN st ON event_type = t
        |WHERE abs(value - mean) > sd * 2
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_mad_outliers" ->
      """WITH ev AS (
        |  SELECT event_type, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |med AS (SELECT event_type AS t, quantile_cont(cents, 0.5) AS med_cents
        |        FROM ev GROUP BY event_type),
        |dev AS (SELECT ev.event_type, abs(ev.cents - med.med_cents) AS dev,
        |               med.med_cents
        |        FROM ev JOIN med ON ev.event_type = med.t),
        |mad AS (SELECT event_type AS t2, quantile_cont(dev, 0.5) AS mad_cents
        |        FROM dev GROUP BY event_type)
        |SELECT d.event_type, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN d.dev > m.mad_cents * 4.4478
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  MAX(d.med_cents) / 100.0 AS median_v,
        |  MAX(m.mad_cents) / 100.0 AS mad_v
        |FROM dev d JOIN mad m ON d.event_type = m.t2
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    "q_zorder_pruned" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE user_id BETWEEN 40 AND 80
        |  AND CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-15'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams0 AS (
        |  SELECT doc_id, array_to_string(list_slice(t, i, i + 7), ' ') AS g
        |  FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS u(i)
        |  WHERE len(t) >= 8),
        |grams AS (SELECT DISTINCT doc_id, g FROM grams0),
        |ev AS (SELECT doc_id AS eval_id, g FROM grams WHERE doc_id % 10 = 0)
        |SELECT tr.doc_id, COUNT(DISTINCT tr.g) AS n_shared,
        |  COUNT(DISTINCT ev.eval_id) AS n_eval_docs
        |FROM grams tr JOIN ev USING (g)
        |WHERE tr.doc_id % 10 <> 0
        |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,
    "q_gopher_repetition" ->
      """WITH lines AS (
        |  SELECT doc_id, unnest(string_split(text, '. ')) AS line FROM documents),
        |ls AS (SELECT doc_id, COUNT(*) AS n_lines, COUNT(DISTINCT line) AS n_uniq
        |  FROM lines GROUP BY doc_id),
        |words AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |wc AS (SELECT doc_id, w, COUNT(*) AS cnt FROM words GROUP BY doc_id, w),
        |ws AS (SELECT doc_id, MAX(cnt) AS top_cnt,
        |  CAST(SUM(cnt) AS BIGINT) AS n_words FROM wc GROUP BY doc_id)
        |SELECT ls.doc_id, n_lines,
        |  CAST(n_lines - n_uniq AS DOUBLE) / n_lines AS dup_line_frac,
        |  CAST(top_cnt AS DOUBLE) / n_words AS top_word_ratio
        |FROM ls JOIN ws USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_inverted_index" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |dt AS (SELECT DISTINCT doc_id, token FROM toks)
        |SELECT token, COUNT(*) AS df,
        |  array_to_string(list_sort(list(doc_id))[1:10], ',') AS postings
        |FROM dt GROUP BY token ORDER BY token""".stripMargin,
    "q_bm25" ->
      """WITH dl AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |  FROM documents),
        |stats AS (SELECT COUNT(*) AS n_docs,
        |  CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
        |tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |  WHERE term IN ('spark', 'vector', 'merge')
        |  GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |partial AS (
        |  SELECT tf.doc_id,
    -- exponent literals (5e-1 …) are DOUBLE in DuckDB; bare decimals
    -- would be DECIMAL and diverge from Spark's double parse tree
        |    CAST(FLOOR(
        |      ln((n_docs - df.df + 5e-1) / (df.df + 5e-1) + 1e0) *
        |        (tf.tf * 22e-1) /
        |        (tf.tf + 12e-1 * (25e-2 + 75e-2 * dl.dl / avgdl)) * 1e6
        |    ) AS BIGINT) AS sc_micro
        |  FROM tf JOIN df USING (term) CROSS JOIN stats
        |  JOIN dl ON tf.doc_id = dl.doc_id)
        |SELECT doc_id, SUM(sc_micro) / 1e6 AS bm25
        |FROM partial GROUP BY doc_id
        |ORDER BY bm25 DESC, doc_id LIMIT 50""".stripMargin,
    // RRF fusion re-derived: the q_bm25 chain verbatim → top-50 rank,
    // the ann_bruteforce cosine chain against vector 0 → top-50 rank,
    // one full-outer rank join, score = Σ 1/(60+rank) — a single IEEE
    // addition of engine-identical doubles, hence hash-exact.
    "q_hybrid_rrf" ->
      """WITH dl AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |  FROM documents),
        |stats AS (SELECT COUNT(*) AS n_docs,
        |  CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
        |tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |  WHERE term IN ('spark', 'vector', 'merge')
        |  GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |partial AS (
        |  SELECT tf.doc_id,
        |    CAST(FLOOR(
        |      ln((n_docs - df.df + 5e-1) / (df.df + 5e-1) + 1e0) *
        |        (tf.tf * 22e-1) /
        |        (tf.tf + 12e-1 * (25e-2 + 75e-2 * dl.dl / avgdl)) * 1e6
        |    ) AS BIGINT) AS sc_micro
        |  FROM tf JOIN df USING (term) CROSS JOIN stats
        |  JOIN dl ON tf.doc_id = dl.doc_id),
        |bmtop AS (
        |  SELECT doc_id, SUM(sc_micro) / 1e6 AS bm25
        |  FROM partial GROUP BY doc_id
        |  ORDER BY bm25 DESC, doc_id LIMIT 50),
        |bmrank AS (
        |  SELECT doc_id, CAST(ROW_NUMBER() OVER
        |    (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS bm25_rank
        |  FROM bmtop),
        |q AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id = 0),
        |costop AS (
        |  SELECT e.vec_id AS doc_id,
        |    list_sum(list_transform(list_zip(qv, e.embedding), x -> x[1] * CAST(x[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(qv, x -> x * x)))
        |       * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
        |  FROM embeddings e, q WHERE e.vec_id <> 0
        |  ORDER BY cosine DESC, doc_id LIMIT 50),
        |cosrank AS (
        |  SELECT doc_id, CAST(ROW_NUMBER() OVER
        |    (ORDER BY cosine DESC, doc_id) AS BIGINT) AS cos_rank
        |  FROM costop)
        |SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
        |  COALESCE(b.bm25_rank, 0) AS bm25_rank,
        |  COALESCE(c.cos_rank, 0) AS cos_rank,
        |  COALESCE(1e0 / (b.bm25_rank + 60), 0e0) +
        |    COALESCE(1e0 / (c.cos_rank + 60), 0e0) AS rrf
        |FROM bmrank b FULL OUTER JOIN cosrank c ON b.doc_id = c.doc_id
        |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,
    "q_pack_sequences" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, dl,
        |    SUM(dl) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d)
        |SELECT lang, CAST((cum - dl) // 2048 AS BIGINT) AS bin, COUNT(*) AS n_docs,
        |  CAST(SUM(dl) AS BIGINT) AS total_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY lang, bin
        |ORDER BY lang, bin""".stripMargin,
    "text_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |freq AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
        |tot AS (SELECT SUM(cnt) AS total FROM freq),
        |lm AS (SELECT token,
        |  CAST(FLOOR(ln(CAST(cnt AS DOUBLE) / total) * 1e6) AS BIGINT) AS lp_micro
        |  FROM freq, tot)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  (0 - SUM(lp_micro)) / (COUNT(*) * 1e6) AS avg_nll
        |FROM toks JOIN lm USING (token)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_window_firsts" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |  o_totalprice,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER w AS last_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders WHERE o_custkey <= 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    "dedup_lines" ->
      """WITH lines AS (
        |  SELECT doc_id, unnest(string_split(text, '. ')) AS line,
        |         generate_subscripts(string_split(text, '. '), 1) AS pos
        |  FROM documents),
        |counts AS (SELECT line, COUNT(DISTINCT doc_id) AS n_docs
        |           FROM lines GROUP BY line)
        |SELECT doc_id, COUNT(*) AS n_kept,
        |  string_agg(line, '. ' ORDER BY pos) AS cleaned
        |FROM lines JOIN counts USING (line)
        |WHERE n_docs <= 2
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_group_cap" ->
      """WITH r AS (
        |  SELECT event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY md5(CAST(event_id AS VARCHAR))) AS rn
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n_sampled,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM r WHERE rn <= 100
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "text_pii_redact" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\b(customer|supplier|key)\b')) AS BIGINT) AS n_redacted,
        |  substring(regexp_replace(text, '\b(customer|supplier|key)\b', '<ENT>', 'g'), 1, 60) AS head60
        |FROM documents ORDER BY doc_id""".stripMargin,
    "emb_centroids" ->
      """WITH q AS (
        |  SELECT d.lang, t.i AS dim,
        |    SUM(FLOOR(CAST(e.embedding[t.i + 1] AS DOUBLE) * 1e6)) AS s,
        |    COUNT(*) AS n_vecs
        |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id, range(64) t(i)
        |  GROUP BY d.lang, t.i)
        |SELECT lang, n_vecs, CAST(dim AS INTEGER) AS dim, s / (n_vecs * 1e6) AS centroid
        |FROM q WHERE dim < 8 ORDER BY lang, dim""".stripMargin,
    "emb_quantize" ->
      """WITH b AS (
        |  SELECT vec_id,
        |    list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS amax
        |  FROM embeddings),
        |q AS (
        |  SELECT e.vec_id, b.amax / 127 AS scale,
        |    list_transform(e.embedding, x ->
        |      least(127.0, greatest(-127.0, FLOOR(CAST(x AS DOUBLE) / (b.amax / 127) + 0.5)))) AS qv,
        |    e.embedding AS emb
        |  FROM embeddings e JOIN b ON e.vec_id = b.vec_id)
        |SELECT vec_id, round(scale, 9) AS scale9,
        |  round(sqrt(list_sum(list_transform(list_zip(emb, qv), p ->
        |    (CAST(p[1] AS DOUBLE) - p[2] * scale) * (CAST(p[1] AS DOUBLE) - p[2] * scale))) / 64), 9) AS rmse9,
        |  CAST(len(list_filter(qv, v -> abs(v) = 127.0)) AS BIGINT) AS n_sat
        |FROM q ORDER BY vec_id""".stripMargin,
    "q_not_in" -> Relational.NotInSql,
    "q_null_safe_join" ->
      """WITH c AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_nationkey % 5 = 0 THEN NULL
        |         ELSE c_nationkey % 5 END AS seg
        |  FROM customer),
        |d AS (SELECT DISTINCT seg FROM c)
        |SELECT COALESCE(CAST(d.seg AS VARCHAR), 'null') AS seg_label,
        |  COUNT(*) AS n
        |FROM c JOIN d ON c.seg IS NOT DISTINCT FROM d.seg
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_intersect_all" ->
      """SELECT bucket, COUNT(*) AS multiplicity FROM (
        |  SELECT CAST(c_nationkey % 7 AS INTEGER) AS bucket FROM customer
        |  INTERSECT ALL
        |  SELECT CAST(s_nationkey % 7 AS INTEGER) FROM supplier) t
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_moving_avg" ->
      """WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
        |  FROM orders GROUP BY 1)
        |SELECT day, CAST(rev AS DOUBLE) AS daily_rev,
        |  CAST(SUM(rev) OVER w AS DOUBLE) / COUNT(*) OVER w AS ma7
        |FROM d
        |WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,
    "q_retention" ->
      """SELECT CAST(date_diff('day', d0, d) AS INTEGER) AS day_offset,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM (SELECT user_id, CAST(ts AS DATE) AS d FROM events) e
        |JOIN (SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id) f
        |  USING (user_id)
        |GROUP BY day_offset
        |ORDER BY day_offset""".stripMargin,
    "q_funnel" ->
      """WITH s AS (SELECT user_id, MIN(ts) AS t_signup FROM events
        |           WHERE event_type = 'signup' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM events e
        |      JOIN s ON e.user_id = s.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= s.t_signup
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
        |      GROUP BY e.user_id)
        |SELECT COUNT(s.t_signup) AS n_signup, COUNT(c.t_click) AS n_click,
        |  COUNT(p.t_purchase) AS n_purchase
        |FROM s LEFT JOIN c ON s.user_id = c.user_id
        |LEFT JOIN p ON p.user_id = c.user_id""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
        |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin,
    "q13_order_dist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q17_small_qty" ->
      """WITH avg_qty AS (
        |  SELECT l_partkey AS p_key,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) * 0.4 AS qty_limit
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN avg_qty ON l_partkey = p_key
        |WHERE p_brand = 'Brand#3' AND l_quantity < qty_limit""".stripMargin,
    "q18_large_volume" ->
      """SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |  o_totalprice, total_qty
        |FROM orders
        |JOIN (SELECT l_orderkey AS big_okey,
        |        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 150.0) b
        |  ON o_orderkey = big_okey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 50""".stripMargin,
    "q14_promo_revenue" ->
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY l_year
        |ORDER BY l_year""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH offers AS (
        |  SELECT l_partkey, l_suppkey, s_name, n_name, p_name,
        |    MIN(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS cost_dec
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'SMALL'
        |  GROUP BY l_partkey, l_suppkey, s_name, n_name, p_name),
        |min_cost AS (
        |  SELECT l_partkey AS mc_partkey, MIN(cost_dec) AS mc
        |  FROM offers GROUP BY l_partkey)
        |SELECT l_partkey AS p_partkey, p_name, s_name, n_name,
        |  CAST(cost_dec AS DOUBLE) AS min_cost
        |FROM offers JOIN min_cost ON l_partkey = mc_partkey AND cost_dec = mc
        |ORDER BY p_partkey, s_name
        |LIMIT 100""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |    - CAST(l_quantity AS DECIMAL(12,2)) * CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.1 AS DECIMAL(12,2))) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,
    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS rev_dec
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
        |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_dec = (SELECT MAX(rev_dec) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q22_global_sales" ->
      """WITH coded AS (
        |  SELECT *, substring(c_name, 17, 2) AS cntrycode FROM customer
        |  WHERE substring(c_name, 17, 2) IN ('01','06','13','17','23','29','31','42','55','64','78','83','90','97'))
        |SELECT cntrycode, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        |FROM coded
        |WHERE c_acctbal > (
        |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        |    FROM coded WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderpriority = '1-URGENT')
        |GROUP BY cntrycode
        |ORDER BY cntrycode""".stripMargin,
    "q_disjunctive_join" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_type = 'PROMO' AND l_quantity >= 40)""".stripMargin,
    "q_unpivot" ->
      """WITH m AS (
        |  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
        |SELECT l_returnflag, measure, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM m GROUP BY l_returnflag, measure
        |ORDER BY l_returnflag, measure""".stripMargin,
    "q_ntile" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
        |  CAST(NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile,
        |  PERCENT_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS pct_rank,
        |  CUME_DIST() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS cume
        |FROM customer
        |ORDER BY c_nationkey, c_acctbal, c_custkey""".stripMargin,
    "q_bloom_pruned_join" ->
      """SELECT s_suppkey, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_nationkey = 3
        |GROUP BY s_suppkey
        |ORDER BY s_suppkey""".stripMargin,
    "q_string_funcs" ->
      """SELECT doc_id, upper(split_part(text, ' ', 1)) AS first_word,
        |  CAST(length(text) - length(replace(text, 'the', '')) AS BIGINT) AS the_chars,
        |  substr(text, 1, 12) AS head12
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_higher_order" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(len(list_filter(string_split(text, ' '), x -> length(x) > 4)) AS BIGINT) AS n_long,
        |  CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS BIGINT) AS sum_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_quantile_sketch" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  quantile_cont(l_quantity, 0.9) AS p90,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_hash_split" ->
      """SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0' THEN 'test'
        |            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '1' THEN 'val'
        |            ELSE 'train' END AS split,
        |  lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents
        |GROUP BY split, lang
        |ORDER BY split, lang""".stripMargin,
    "q_token_freq" ->
      """SELECT token, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |GROUP BY token
        |ORDER BY n DESC, token
        |LIMIT 20""".stripMargin,
    "q_length_histogram" ->
      """SELECT (n_chars // 100) * 100 AS bucket_lo, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
        |FROM documents
        |GROUP BY bucket_lo
        |ORDER BY bucket_lo""".stripMargin,
    "dedup_clusters" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |         ELSE list_transform(generate_series(1, len(t) - 2),
        |                i -> array_to_string(t[i:i+2], ' ')) END)) AS sh
        |  FROM toks),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |cpairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jpairs AS (
        |  SELECT id_a, id_b FROM cpairs
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE CAST(common AS DOUBLE) / (na.n + nb.n - common) >= 0.8),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM jpairs
        |  UNION SELECT id_b, id_a FROM jpairs),
        |walk(v, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, w.label FROM edges e JOIN walk w ON w.v = e.dst)
        |SELECT v AS vertex, MIN(label) AS component
        |FROM walk GROUP BY v ORDER BY vertex""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |  CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q6_revenue_forecast" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |GROUP BY c_custkey, c_name, c_mktsegment, c_acctbal
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |                    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "q_rollup" ->
      """SELECT c_nationkey, c_mktsegment, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |GROUP BY ROLLUP(c_nationkey, c_mktsegment)
        |ORDER BY c_nationkey NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT c_nationkey, c_mktsegment, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |GROUP BY CUBE(c_nationkey, c_mktsegment)
        |ORDER BY c_nationkey NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,
    "q_having" ->
      """SELECT l_suppkey, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
        |FROM lineitem
        |GROUP BY l_suppkey
        |HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 1500.0
        |ORDER BY l_suppkey""".stripMargin,
    "q_distinct_agg" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(l_shipdate AS DATE) AS ship_date,
        |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem
        |WHERE l_suppkey <= 10
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q_topk_per_group" ->
      """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk,
        |    o_orderkey, o_totalprice
        |  FROM orders) t
        |WHERE rk <= 3
        |ORDER BY o_orderpriority, rk""".stripMargin,
    "q_topk_custom" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 3
        |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin,
    // same answer as q_topk_custom — the point is the PLAN: the window
    // idiom auto-rewritten to the heap operator by TopKRewrite
    "q_topk_rewritten" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 3
        |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin,
    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 25""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM customer)
        |ORDER BY c_custkey""".stripMargin,
    "q_union_dedup" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey FROM supplier) t
        |ORDER BY nationkey""".stripMargin,
    "q_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS order_date, o_totalprice,
        |  LAG(o_totalprice, 1) OVER w AS prev_price,
        |  LEAD(o_totalprice, 1) OVER w AS next_price
        |FROM orders
        |WHERE o_custkey <= 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    "etl_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS INTEGER) AS k,
        |  event_type, value
        |FROM events
        |WHERE CAST(json_extract(props, '$.k') AS INTEGER) >= 50
        |ORDER BY event_id""".stripMargin,
    "etl_dedup_append" ->
      """SELECT doc_id, source, n_chars
        |FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM documents e
        |                  WHERE e.doc_id = d.doc_id AND e.doc_id % 10 = 0)
        |ORDER BY doc_id""".stripMargin,
    // the adopted Delta live set is batches A (doc_id%3=0) and B (%3=1)
    // — batch C was added at v1 and REMOVED at v2 of the source log
    "etl_convert_from_delta" ->
      """SELECT doc_id, source, n_chars
        |FROM documents
        |WHERE doc_id % 3 < 2
        |ORDER BY doc_id""".stripMargin,
    // the adopted PARTITIONED live set: src7's file was REMOVED at v1
    // of the source log, so the filtered read returns src3+src12 only
    "etl_convert_from_delta_part" ->
      """SELECT doc_id, source, n_chars
        |FROM documents
        |WHERE source IN ('src3', 'src12')
        |ORDER BY doc_id""".stripMargin,
    // the adopted DV-bearing live set: batch A (doc_id%3=0, sorted)
    // masks row positions idx%7=0 via a .bin RoaringBitmap sidecar,
    // batch B (%3=1) masks idx%11=3 inline, batch C (%3=2) unmasked —
    // row_number over each sorted batch IS the file row position
    "etl_convert_from_delta_dv" ->
      """WITH a AS (SELECT doc_id, source, n_chars,
        |             row_number() OVER (ORDER BY doc_id) - 1 AS idx
        |           FROM documents WHERE doc_id % 3 = 0),
        |     b AS (SELECT doc_id, source, n_chars,
        |             row_number() OVER (ORDER BY doc_id) - 1 AS idx
        |           FROM documents WHERE doc_id % 3 = 1)
        |SELECT doc_id, source, n_chars FROM a WHERE idx % 7 <> 0
        |UNION ALL
        |SELECT doc_id, source, n_chars FROM b WHERE idx % 11 <> 3
        |UNION ALL
        |SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 3 = 2
        |ORDER BY doc_id""".stripMargin,
    "text_token_count" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN regexp_replace(text, '^\s+|\s+$', '', 'g') = '' THEN 0
        |       ELSE len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) END AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS bpe_tokens,
        |  n_chars
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN regexp_replace(text, '^\s+|\s+$', '', 'g') = '' THEN 0
        |         ELSE len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) END AS ntok,
        |    len(list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
        |        x -> x IN ('the','a','an','and','of','to','in','is','it','that'))) AS nstop,
        |    len(regexp_extract_all(text, '[[:punct:]]')) AS npunct,
        |    len(regexp_extract_all(text, '[A-Z]')) AS nupper
        |  FROM documents)
        |SELECT doc_id, CAST(ntok AS BIGINT) AS ws_tokens,
        |  0.4 * (CASE WHEN ntok = 0 THEN 0.0 ELSE CAST(nstop AS DOUBLE) / ntok END)
        |  + 0.3 * (1.0 - CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(npunct AS DOUBLE) / n_chars END)
        |  + 0.2 * least(1.0, CAST(ntok AS DOUBLE) / 100.0)
        |  + 0.1 * (1.0 - CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(nupper AS DOUBLE) / n_chars END) AS quality
        |FROM t
        |ORDER BY doc_id""".stripMargin,
    // learned quality, closed-form ridge: the teacher score (the
    // text_quality expression, already hash-proven engine-identical)
    // quantizes to integer micros; n/Σx/Σy/Σx²/Σxy are exact integer
    // aggregates; slope and intercept are two fixed IEEE divisions;
    // the per-doc prediction quantizes back — fit AND scoring
    // re-derive bit-for-bit
    "q_quality_learned" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN regexp_replace(text, '^\s+|\s+$', '', 'g') = '' THEN 0
        |         ELSE len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) END AS ntok,
        |    len(list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
        |        x -> x IN ('the','a','an','and','of','to','in','is','it','that'))) AS nstop,
        |    len(regexp_extract_all(text, '[[:punct:]]')) AS npunct,
        |    len(regexp_extract_all(text, '[A-Z]')) AS nupper
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, CAST(ntok AS BIGINT) AS x,
        |    CAST(round((0.4 * (CASE WHEN ntok = 0 THEN 0.0 ELSE CAST(nstop AS DOUBLE) / ntok END)
        |      + 0.3 * (1.0 - CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(npunct AS DOUBLE) / n_chars END)
        |      + 0.2 * least(1.0, CAST(ntok AS DOUBLE) / 100.0)
        |      + 0.1 * (1.0 - CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(nupper AS DOUBLE) / n_chars END))
        |      * 1000000.0) AS BIGINT) AS y
        |  FROM t),
        |s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * x) AS sxx, SUM(x * y) AS sxy FROM f),
        |w AS (
        |  SELECT n, sx, sy,
        |    CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx + n * 100 AS DOUBLE) AS w1 FROM s),
        |w2 AS (
        |  SELECT w1,
        |    (CAST(sy AS DOUBLE) - w1 * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS w0
        |  FROM w)
        |SELECT f.doc_id, f.x AS n_tokens,
        |  CAST(round(w0 + w1 * CAST(f.x AS DOUBLE)) AS BIGINT) AS learned_micro
        |FROM f, w2
        |ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(tk, x -> x IN ('the','and','of','to','in'))) AS BIGINT) AS s_en,
        |    CAST(len(list_filter(tk, x -> x IN ('el','la','los','de','que'))) AS BIGINT) AS s_es,
        |    CAST(len(list_filter(tk, x -> x IN ('der','die','und','das','ist'))) AS BIGINT) AS s_de,
        |    CAST(len(list_filter(tk, x -> x IN ('le','les','et','dans','est'))) AS BIGINT) AS s_fr,
        |    CAST(len(list_filter(tk, x -> x IN ('de5','shi4','le5','zai4','he2'))) AS BIGINT) AS s_zh
        |  FROM toks)
        |SELECT doc_id, lang,
        |  CASE WHEN greatest(s_en, s_es, s_de, s_fr, s_zh) = 0 THEN 'und'
        |       WHEN s_en = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'en'
        |       WHEN s_es = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'es'
        |       WHEN s_de = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'de'
        |       WHEN s_fr = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'fr'
        |       WHEN s_zh = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'zh'
        |       ELSE 'und' END AS pred,
        |  s_en, s_es, s_de, s_fr, s_zh
        |FROM scored
        |ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """WITH input AS (
        |  SELECT doc_id, text, lang, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000 AS doc_id, text, lang, source
        |  FROM documents WHERE doc_id % 25 = 0),
        |keyed AS (
        |  SELECT doc_id, lang, source,
        |    MIN(doc_id) OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS keep
        |  FROM input)
        |SELECT doc_id, lang, source FROM keyed WHERE doc_id = keep
        |ORDER BY doc_id""".stripMargin,
    // Exact n-gram Jaccard is deterministic math: the LSH stage only
    // proposes candidates, and at threshold 0.3 / 16 bands its miss
    // probability for a true j>=0.8 pair is ~2e-4 (the corpus's natural
    // near-dups are j>=0.95, miss ~2e-12) — so all-pairs DuckDB ground
    // truth and the Spark plan agree on this data.
    // The full curation pipeline re-derived: annotate (langid +
    // quality + token count) → filter → min-id exact dedup → all-pairs
    // 3-gram Jaccard losers → anti-join. The Spark plan's LSH stage is
    // candidate GENERATION only (miss probability ~1e-12 for this
    // corpus's j≥0.95 planted near-dups), so exhaustive ground truth
    // matches row-for-row.
    "pipeline_curate" -> (CurateCtes + "\n" +
      """SELECT doc_id, lang_pred, quality, n_tokens
        |FROM exact WHERE doc_id NOT IN (SELECT id_b FROM losers)
        |ORDER BY doc_id""".stripMargin),
    // The packing tail on top of the same curate chain: the two-level
    // running sum is output-identical to a per-language window cumsum
    // (RunningSumSpec proves the equivalence), so the whole manifest is
    // a deterministic SQL re-derivation.
    "pipeline_pretrain" -> (CurateCtes + ",\n" +
      """curated AS (
        |  SELECT doc_id, text, lang_pred FROM exact
        |  WHERE doc_id NOT IN (SELECT id_b FROM losers)),
        |chunks AS (
        |  SELECT doc_id, lang_pred,
        |    CAST(s.st // 12 AS BIGINT) AS chunk_idx,
        |    least(16::BIGINT, n - s.st) AS chunk_tokens
        |  FROM (SELECT doc_id, lang_pred, CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM curated) d,
        |    LATERAL (SELECT unnest(generate_series(0, CAST(n - 1 AS BIGINT), 12)) AS st) s),
        |cum AS (
        |  SELECT *, SUM(chunk_tokens) OVER (PARTITION BY lang_pred ORDER BY doc_id, chunk_idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        |  FROM chunks)
        |SELECT lang_pred, CAST((c - chunk_tokens) // 2048 AS BIGINT) AS bin,
        |  COUNT(*) AS n_chunks, COUNT(DISTINCT doc_id) AS n_docs,
        |  CAST(SUM(chunk_tokens) AS BIGINT) AS bin_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM cum GROUP BY lang_pred, bin ORDER BY lang_pred, bin""".stripMargin),
    // The md5-signature SimHash: the hash chain (md5 hex → 60-bit int
    // → bit votes → signature) is re-derived in SQL and the 8-chunk
    // banding is EXACT for hamming ≤ 7, so all-pairs DuckDB ground
    // truth equals the banded Spark plan row-for-row.
    // md5-minhash chain re-derived end-to-end: shingle md5 hashes mod
    // 2^31-1, 64 linear permutations with md5-derived coefficients
    // (mutually independent — see minhashMd5Pairs scaladoc; every
    // product < 2^62 so BIGINT arithmetic is exact), value-tuple
    // banding, >=32-of-64 estimate filter. Pair-set equality pins
    // banding AND signatures exactly.
    "dedup_minhash_lsh" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |hs AS (
        |  SELECT DISTINCT doc_id,
        |    ('0x' || substr(md5(sh), 1, 15))::BIGINT % 2147483647 AS x
        |  FROM (SELECT doc_id, unnest(
        |      CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |           ELSE list_transform(generate_series(1, len(t) - 2),
        |                  i -> array_to_string(t[i:i+2], ' ')) END) AS sh
        |    FROM toks)),
        |coef AS (
        |  SELECT g.i AS i,
        |    (('0x' || substr(md5(CAST(2 * g.i AS VARCHAR)), 1, 15))::BIGINT
        |       % 2147483646) + 1 AS a,
        |    ('0x' || substr(md5(CAST(2 * g.i + 1 AS VARCHAR)), 1, 15))::BIGINT
        |       % 2147483647 AS b
        |  FROM generate_series(0, 63) g(i)),
        |sig AS (
        |  SELECT doc_id, c.i AS i, MIN((c.a * x + c.b) % 2147483647) AS s
        |  FROM hs CROSS JOIN coef c
        |  GROUP BY doc_id, c.i),
        |sigl AS (
        |  SELECT doc_id, list(s ORDER BY i) AS sig FROM sig GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id,
        |    g.b AS band,
        |    array_to_string(sig[g.b * 4 + 1 : g.b * 4 + 4], '|') AS bandkey
        |  FROM sigl CROSS JOIN generate_series(0, 15) g(b)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bandkey = b.bandkey
        |       AND a.doc_id < b.doc_id),
        |est AS (
        |  SELECT c.id_a, c.id_b,
        |    SUM(CASE WHEN sa.s = sb.s THEN 1 ELSE 0 END) AS m
        |  FROM cand c
        |  JOIN sig sa ON sa.doc_id = c.id_a
        |  JOIN sig sb ON sb.doc_id = c.id_b AND sb.i = sa.i
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, m / 64.0 AS est_jaccard
        |FROM est WHERE m >= 32
        |ORDER BY id_a, id_b""".stripMargin,
    "dedup_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |hs AS (
        |  SELECT DISTINCT doc_id,
        |    ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h
        |  FROM (SELECT doc_id, unnest(
        |      CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |           ELSE list_transform(generate_series(1, len(t) - 2),
        |                  i -> array_to_string(t[i:i+2], ' ')) END) AS sh
        |    FROM toks)),
        |votes AS (
        |  SELECT doc_id, g.i AS i,
        |    SUM(CASE WHEN (h >> g.i) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM hs CROSS JOIN generate_series(0, 59) g(i)
        |  GROUP BY doc_id, g.i),
        |sig AS (
        |  SELECT doc_id, SUM(CASE WHEN v > 0 THEN (1::BIGINT << i) ELSE 0 END)::BIGINT AS sig
        |  FROM votes GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 7
        |ORDER BY id_a, id_b""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |         ELSE list_transform(generate_series(1, len(t) - 2),
        |                i -> array_to_string(t[i:i+2], ' ')) END)) AS sh
        |  FROM toks),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  CAST(common AS DOUBLE) / (na.n + nb.n - common) AS jaccard
        |FROM pairs
        |JOIN sizes na ON na.doc_id = id_a
        |JOIN sizes nb ON nb.doc_id = id_b
        |WHERE CAST(common AS DOUBLE) / (na.n + nb.n - common) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    // Exact cosine over planted perturbations (natural max cosine ~0.48,
    // planted ~1.0 — nothing near the 0.95 boundary); DuckDB lambda index
    // is 1-based where Spark's transform index is 0-based, hence (i-1).
    "dedup_embedding" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000 AS vec_id,
        |    list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) +
        |      CASE WHEN (i - 1) % 7 = 0 THEN 0.05 ELSE -0.01 END) AS v
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]))
        |    / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
        |       * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cosine
        |  FROM base a, base b WHERE a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(cosine, 6) AS cosine FROM pairs
        |WHERE cosine >= 0.95
        |ORDER BY id_a, id_b""".stripMargin,
    // SemDeDup re-derived end-to-end: md5 centroid matrix (the ann_ivf
    // CTEs), argmax-cosine cluster assignment (ties to the lower cell),
    // cluster-bounded τ-pruning against lower-id mates, min-id
    // survivor. Full (vec_id, cluster, kept) equality pins assignment,
    // candidate bounding AND survivor choice.
    "dedup_semantic" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000 AS vec_id,
        |    list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) +
        |      CASE WHEN (i - 1) % 7 = 0 THEN 0.05 ELSE -0.01 END) AS v
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |cent AS (
        |  SELECT c.c AS cl_id,
        |    list_transform(generate_series(0, 63), d ->
        |      ('0x' || substr(md5('ivf,' || CAST(c.c AS VARCHAR) || ',' ||
        |           CAST(d AS VARCHAR)), 1, 15))::BIGINT
        |        / 1152921504606846976.0 - 0.5) AS cv
        |  FROM generate_series(0, 15) c(c)),
        |cnorm AS (
        |  SELECT cl_id, cv, sqrt(list_sum(list_transform(cv, x -> x * x))) AS cn
        |  FROM cent),
        |sims AS (
        |  SELECT b.vec_id, c.cl_id,
        |    list_sum(list_transform(list_zip(b.v, c.cv), x -> x[1] * x[2]))
        |    / (sqrt(list_sum(list_transform(b.v, x -> x * x))) * c.cn) AS sim
        |  FROM base b CROSS JOIN cnorm c),
        |assign AS (
        |  SELECT vec_id, cl_id AS cluster FROM (
        |    SELECT vec_id, cl_id,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cl_id) AS r
        |    FROM sims) t WHERE r = 1),
        |dropped AS (
        |  SELECT DISTINCT x.vec_id
        |  FROM assign x
        |  JOIN assign m ON x.cluster = m.cluster AND m.vec_id < x.vec_id
        |  JOIN base bx ON bx.vec_id = x.vec_id
        |  JOIN base bm ON bm.vec_id = m.vec_id
        |  WHERE list_sum(list_transform(list_zip(bx.v, bm.v), p -> p[1] * p[2]))
        |    / (sqrt(list_sum(list_transform(bx.v, p -> p * p)))
        |     * sqrt(list_sum(list_transform(bm.v, p -> p * p)))) >= 0.95)
        |SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
        |  (d.vec_id IS NULL) AS kept
        |FROM assign a LEFT JOIN dropped d ON d.vec_id = a.vec_id
        |ORDER BY a.vec_id""".stripMargin,
    // md5-plane sign-LSH re-derived end-to-end: plane coefficients from
    // md5("t,p,d"), bucket bits from the SAME sequential double fold
    // the cosine oracle uses, candidate join per table, exact cosine
    // rank. Full top-k equality pins planes, buckets AND ranking.
    "ann_lsh_topk" ->
      """WITH coef AS (
        |  SELECT t.t AS tbl, p.p AS pl,
        |    list_transform(generate_series(0, 63), d ->
        |      ('0x' || substr(md5(CAST(t.t AS VARCHAR) || ',' ||
        |           CAST(p.p AS VARCHAR) || ',' || CAST(d AS VARCHAR)), 1, 15))::BIGINT
        |        / 1152921504606846976.0 - 0.5) AS cl
        |  FROM generate_series(0, 7) t(t), generate_series(0, 4) p(p)),
        |buckets AS (
        |  SELECT e.vec_id, c.tbl,
        |    SUM(CASE WHEN list_sum(list_transform(list_zip(e.embedding, c.cl),
        |          x -> CAST(x[1] AS DOUBLE) * x[2])) > 0
        |        THEN (1 << c.pl) ELSE 0 END) AS bucket
        |  FROM embeddings e CROSS JOIN coef c
        |  GROUP BY e.vec_id, c.tbl),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, b.vec_id AS neighbor_id
        |  FROM buckets q JOIN buckets b ON q.tbl = b.tbl AND q.bucket = b.bucket
        |  WHERE q.vec_id < 8 AND b.vec_id <> q.vec_id),
        |scored AS (
        |  SELECT c.query_id, c.neighbor_id,
        |    list_sum(list_transform(list_zip(eq.embedding, eb.embedding),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(eq.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
        |  FROM cand c
        |  JOIN embeddings eq ON eq.vec_id = c.query_id
        |  JOIN embeddings eb ON eb.vec_id = c.neighbor_id)
        |SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine FROM (
        |  SELECT query_id, neighbor_id, cosine,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM scored) t
        |WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
    // same chain, full-corpus self-join, top-3 per vector
    "knn_graph" ->
      """WITH coef AS (
        |  SELECT t.t AS tbl, p.p AS pl,
        |    list_transform(generate_series(0, 63), d ->
        |      ('0x' || substr(md5(CAST(t.t AS VARCHAR) || ',' ||
        |           CAST(p.p AS VARCHAR) || ',' || CAST(d AS VARCHAR)), 1, 15))::BIGINT
        |        / 1152921504606846976.0 - 0.5) AS cl
        |  FROM generate_series(0, 7) t(t), generate_series(0, 4) p(p)),
        |buckets AS (
        |  SELECT e.vec_id, c.tbl,
        |    SUM(CASE WHEN list_sum(list_transform(list_zip(e.embedding, c.cl),
        |          x -> CAST(x[1] AS DOUBLE) * x[2])) > 0
        |        THEN (1 << c.pl) ELSE 0 END) AS bucket
        |  FROM embeddings e CROSS JOIN coef c
        |  GROUP BY e.vec_id, c.tbl),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, b.vec_id AS neighbor_id
        |  FROM buckets q JOIN buckets b ON q.tbl = b.tbl AND q.bucket = b.bucket
        |  WHERE b.vec_id <> q.vec_id),
        |scored AS (
        |  SELECT c.query_id, c.neighbor_id,
        |    list_sum(list_transform(list_zip(eq.embedding, eb.embedding),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(eq.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
        |  FROM cand c
        |  JOIN embeddings eq ON eq.vec_id = c.query_id
        |  JOIN embeddings eb ON eb.vec_id = c.neighbor_id)
        |SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine FROM (
        |  SELECT query_id, neighbor_id, cosine,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM scored) t
        |WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin,
    "ann_bruteforce_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
        |s AS (
        |  SELECT query_id, e.vec_id AS neighbor_id,
        |    list_sum(list_transform(list_zip(qv, e.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
        |  FROM q, embeddings e
        |  WHERE e.vec_id <> query_id)
        |SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine FROM (
        |  SELECT query_id, neighbor_id, cosine,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM s) t
        |WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
    // HNSW invariant twin: queries are the first 8 corpus vectors
    // re-entered under fresh ids (+100000), so the deterministic
    // graph probe's exact top-10 — twin at rank 1 with cosine 1,
    // every pair's cosine recomputed from the raw vectors — IS the
    // brute-force derivation below; full-ranking equality pins the
    // build, the shard routing and the beam search end-to-end.
    // Artetxe & Schwenk ratio margin, re-derived end-to-end: sides by
    // id parity, 8 planted translation twins on the target side,
    // per-pair cosines quantized to integer micros BEFORE the k-sums
    // (order-free integer aggregation in any engine), margin = one
    // IEEE division of exactly-derived operands, both rankings ordered
    // by (quantized value, id)
    "q_margin_mining" ->
      """WITH src AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
        |tgt AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1
        |  UNION ALL
        |  SELECT vec_id + 100001 AS vec_id, embedding FROM embeddings
        |  WHERE vec_id % 2 = 0 AND vec_id < 16),
        |q AS (SELECT vec_id AS query_id, embedding AS qv FROM src WHERE vec_id < 16),
        |fwd AS (
        |  SELECT q.query_id, t.vec_id AS matched_id,
        |    CAST(round((list_sum(list_transform(list_zip(q.qv, t.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(t.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))
        |      * 1000000.0) AS BIGINT) AS cm
        |  FROM q, tgt t),
        |franked AS (
        |  SELECT query_id, matched_id, cm,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cm DESC, matched_id) AS frank
        |  FROM fwd),
        |sum_fwd AS (
        |  SELECT query_id, SUM(cm) AS sum_fwd FROM franked WHERE frank <= 4 GROUP BY query_id),
        |cands AS (SELECT DISTINCT matched_id FROM franked WHERE frank <= 8),
        |rev AS (
        |  SELECT c.matched_id, s.vec_id AS src_id,
        |    CAST(round((list_sum(list_transform(list_zip(t.embedding, s.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(t.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(s.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))
        |      * 1000000.0) AS BIGINT) AS rcm
        |  FROM cands c
        |  JOIN tgt t ON t.vec_id = c.matched_id
        |  CROSS JOIN src s),
        |sum_rev AS (
        |  SELECT matched_id, SUM(rcm) AS sum_rev FROM (
        |    SELECT matched_id, rcm,
        |      ROW_NUMBER() OVER (PARTITION BY matched_id ORDER BY rcm DESC, src_id) AS rrank
        |    FROM rev) rr
        |  WHERE rrank <= 4 GROUP BY matched_id),
        |pairs AS (
        |  SELECT f.query_id, f.matched_id,
        |    (CAST(f.cm AS DOUBLE) * 8.0) / CAST(sf.sum_fwd + sr.sum_rev AS DOUBLE) AS margin
        |  FROM franked f
        |  JOIN sum_fwd sf ON sf.query_id = f.query_id
        |  JOIN sum_rev sr ON sr.matched_id = f.matched_id
        |  WHERE f.frank <= 8)
        |SELECT query_id, rank, matched_id, round(margin, 6) AS margin FROM (
        |  SELECT query_id, matched_id, margin,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY margin DESC, matched_id) AS BIGINT) AS rank
        |  FROM pairs) z
        |WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin,
    // corpus-scale ANN twin: the whole source side is the query set;
    // exhaustive ef makes the exact derivation the oracle
    "q_margin_mining_ann" ->
      """WITH src AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
        |tgt AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1
        |  UNION ALL
        |  SELECT vec_id + 100001 AS vec_id, embedding FROM embeddings
        |  WHERE vec_id % 2 = 0 AND vec_id < 16),
        |q AS (SELECT vec_id AS query_id, embedding AS qv FROM src),
        |fwd AS (
        |  SELECT q.query_id, t.vec_id AS matched_id,
        |    CAST(round((list_sum(list_transform(list_zip(q.qv, t.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(t.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))
        |      * 1000000.0) AS BIGINT) AS cm
        |  FROM q, tgt t),
        |franked AS (
        |  SELECT query_id, matched_id, cm,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cm DESC, matched_id) AS frank
        |  FROM fwd),
        |sum_fwd AS (
        |  SELECT query_id, SUM(cm) AS sum_fwd FROM franked WHERE frank <= 4 GROUP BY query_id),
        |cands AS (SELECT DISTINCT matched_id FROM franked WHERE frank <= 8),
        |rev AS (
        |  SELECT c.matched_id, s.vec_id AS src_id,
        |    CAST(round((list_sum(list_transform(list_zip(t.embedding, s.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(t.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(s.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))
        |      * 1000000.0) AS BIGINT) AS rcm
        |  FROM cands c
        |  JOIN tgt t ON t.vec_id = c.matched_id
        |  CROSS JOIN src s),
        |sum_rev AS (
        |  SELECT matched_id, SUM(rcm) AS sum_rev FROM (
        |    SELECT matched_id, rcm,
        |      ROW_NUMBER() OVER (PARTITION BY matched_id ORDER BY rcm DESC, src_id) AS rrank
        |    FROM rev) rr
        |  WHERE rrank <= 4 GROUP BY matched_id),
        |pairs AS (
        |  SELECT f.query_id, f.matched_id,
        |    (CAST(f.cm AS DOUBLE) * 8.0) / CAST(sf.sum_fwd + sr.sum_rev AS DOUBLE) AS margin
        |  FROM franked f
        |  JOIN sum_fwd sf ON sf.query_id = f.query_id
        |  JOIN sum_rev sr ON sr.matched_id = f.matched_id
        |  WHERE f.frank <= 8)
        |SELECT query_id, rank, matched_id, round(margin, 6) AS margin FROM (
        |  SELECT query_id, matched_id, margin,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY margin DESC, matched_id) AS BIGINT) AS rank
        |  FROM pairs) z
        |WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin,
    "ann_hnsw_topk" ->
      """WITH q AS (
        |  SELECT vec_id + 100000 AS query_id, embedding AS qv
        |  FROM embeddings WHERE vec_id < 8),
        |s AS (
        |  SELECT query_id, e.vec_id AS neighbor_id,
        |    list_sum(list_transform(list_zip(qv, e.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
        |  FROM q, embeddings e)
        |SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine FROM (
        |  SELECT query_id, neighbor_id, cosine,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM s) t
        |WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
    // md5-centroid IVF re-derived end-to-end: 16×64 centroid matrix
    // from md5("ivf,c,d"), cell assignment by argmax cosine (same
    // sequential double fold as the kernel, ties to the lower cell
    // id), nprobe=4 probe set per query, candidate join inside probed
    // cells only, exact cosine rank. Full top-k equality pins the
    // quantizer, the assignment AND the ranking.
    "ann_ivf_topk" ->
      """WITH cent AS (
        |  SELECT c.c AS cl_id,
        |    list_transform(generate_series(0, 63), d ->
        |      ('0x' || substr(md5('ivf,' || CAST(c.c AS VARCHAR) || ',' ||
        |           CAST(d AS VARCHAR)), 1, 15))::BIGINT
        |        / 1152921504606846976.0 - 0.5) AS cv
        |  FROM generate_series(0, 15) c(c)),
        |cnorm AS (
        |  SELECT cl_id, cv,
        |    sqrt(list_sum(list_transform(cv, x -> x * x))) AS cn
        |  FROM cent),
        |sims AS (
        |  SELECT e.vec_id, c.cl_id,
        |    list_sum(list_transform(list_zip(e.embedding, c.cv),
        |        x -> CAST(x[1] AS DOUBLE) * x[2]))
        |    / (sqrt(list_sum(list_transform(e.embedding,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * c.cn) AS sim
        |  FROM embeddings e CROSS JOIN cnorm c),
        |ranked AS (
        |  SELECT vec_id, cl_id,
        |    ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY sim DESC, cl_id) AS r
        |  FROM sims),
        |assign AS (SELECT vec_id, cl_id AS cluster FROM ranked WHERE r = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, cl_id AS cluster
        |  FROM ranked WHERE r <= 4 AND vec_id < 8),
        |cand AS (
        |  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
        |  FROM probes p JOIN assign a ON a.cluster = p.cluster
        |  WHERE a.vec_id <> p.query_id),
        |scored AS (
        |  SELECT c.query_id, c.neighbor_id,
        |    list_sum(list_transform(list_zip(eq.embedding, eb.embedding),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(eq.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
        |  FROM cand c
        |  JOIN embeddings eq ON eq.vec_id = c.query_id
        |  JOIN embeddings eb ON eb.vec_id = c.neighbor_id)
        |SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine FROM (
        |  SELECT query_id, neighbor_id, cosine,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM scored) t
        |WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
    // md5-codebook PQ re-derived end-to-end: 8 subspaces × 16 codes ×
    // 8 dims from md5("pq,j,c,d"), per-subspace assignment by argmax
    // cosine (ties to the lower code), reconstruction by codeword
    // concatenation, approximate cosine vs the reconstruction,
    // shortlist-64 cut (approx DESC, id), exact cosine re-rank top-10.
    "ann_pq_topk" ->
      """WITH book AS (
        |  SELECT j.j AS sub, c.c AS code,
        |    list_transform(generate_series(0, 7), d ->
        |      ('0x' || substr(md5('pq,' || CAST(j.j AS VARCHAR) || ',' ||
        |           CAST(c.c AS VARCHAR) || ',' || CAST(d AS VARCHAR)), 1, 15))::BIGINT
        |        / 1152921504606846976.0 - 0.5) AS bv
        |  FROM generate_series(0, 7) j(j), generate_series(0, 15) c(c)),
        |bnorm AS (
        |  SELECT sub, code, bv,
        |    sqrt(list_sum(list_transform(bv, x -> x * x))) AS bn
        |  FROM book),
        |subvec AS (
        |  SELECT e.vec_id, j.j AS sub,
        |    list_transform(list_slice(e.embedding, j.j * 8 + 1, j.j * 8 + 8),
        |      x -> CAST(x AS DOUBLE)) AS sv
        |  FROM embeddings e, generate_series(0, 7) j(j)),
        |assigned AS (
        |  SELECT vec_id, sub, code FROM (
        |    SELECT s.vec_id, s.sub, b.code,
        |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub ORDER BY
        |        list_sum(list_transform(list_zip(s.sv, b.bv), x -> x[1] * x[2]))
        |        / (sqrt(list_sum(list_transform(s.sv, x -> x * x))) * b.bn)
        |          DESC, b.code) AS r
        |    FROM subvec s JOIN bnorm b ON b.sub = s.sub) t
        |  WHERE r = 1),
        |decoded AS (
        |  SELECT a.vec_id, flatten(list(b.bv ORDER BY a.sub)) AS dv
        |  FROM assigned a JOIN book b ON b.sub = a.sub AND b.code = a.code
        |  GROUP BY a.vec_id),
        |approx AS (
        |  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
        |    list_sum(list_transform(list_zip(q.embedding, d.dv),
        |        x -> CAST(x[1] AS DOUBLE) * x[2]))
        |    / (sqrt(list_sum(list_transform(q.embedding,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(d.dv, x -> x * x)))) AS a
        |  FROM embeddings q JOIN decoded d ON d.vec_id <> q.vec_id
        |  WHERE q.vec_id < 8),
        |short AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY a DESC, neighbor_id) AS ar
        |    FROM approx) t
        |  WHERE ar <= 64),
        |scored AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    list_sum(list_transform(list_zip(eq.embedding, eb.embedding),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(eq.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
        |  FROM short s
        |  JOIN embeddings eq ON eq.vec_id = s.query_id
        |  JOIN embeddings eb ON eb.vec_id = s.neighbor_id)
        |SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine FROM (
        |  SELECT query_id, neighbor_id, cosine,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM scored) t
        |WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
    // rank-then-filter formulation — O(events × orders-per-user) in the
    // oracle is fine at sf0.01; the Spark side is the union-window plan
    "q_asof_join" ->
      """WITH cand AS (
        |  SELECT e.event_id, o.o_orderkey, o.o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |SELECT e.event_id, e.user_id,
        |  c.o_orderkey AS asof_orderkey, c.o_totalprice AS asof_totalprice
        |FROM events e LEFT JOIN cand c ON c.event_id = e.event_id AND c.rn = 1
        |ORDER BY e.event_id""".stripMargin,
    // one SQL string, two engines (like q_sql_catalog)
    "q_grouping_sets" -> Relational.GroupingSetsSql,
    "q_window_range_frame" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) OVER (
        |    PARTITION BY l_suppkey ORDER BY l_shipdate
        |    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_30d
        |FROM lineitem
        |WHERE l_suppkey <= 20
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin,
    "q_intersect_except" ->
      """WITH y95 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'),
        |y96 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
        |cohorts AS (
        |  SELECT 'both' AS cohort, o_custkey FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
        |  UNION ALL
        |  SELECT 'only_1995' AS cohort, o_custkey FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96))
        |SELECT cohort, COUNT(*) AS n_customers
        |FROM cohorts GROUP BY cohort ORDER BY cohort""".stripMargin,
    "q_full_outer" ->
      """SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey, c.c_name,
        |  o.n_orders, o.total_spend
        |FROM customer c FULL OUTER JOIN (
        |  SELECT o_custkey, COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend
        |  FROM orders GROUP BY o_custkey) o
        |ON c.c_custkey = o.o_custkey
        |ORDER BY custkey""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.9) AS p90,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // the oracle computes the PLAIN join: the salted plan must agree
    "q_skew_salted_join" ->
      """SELECT p_brand, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "q12_late_lines" ->
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
        |  COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
        |  COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        |GROUP BY ship_year
        |ORDER BY ship_year""".stripMargin,
    "q16_supplier_variety" ->
      """SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size <= 20
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,
    "q20_excess_stock" ->
      """WITH sp AS (
        |  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS q
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY 1, 2),
        |pt AS (SELECT l_partkey, SUM(q) AS tot, COUNT(*) AS n_supp FROM sp GROUP BY 1)
        |SELECT s_suppkey, s_name, s_acctbal
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT sp.l_suppkey FROM sp JOIN pt USING (l_partkey)
        |  WHERE pt.n_supp >= 2 AND sp.q * 10 > pt.tot * 9)
        |ORDER BY s_suppkey""".stripMargin,
    "q21_waiting_supplier" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM lineitem l1
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,
    "q_stratified_sample" ->
      """SELECT event_type, COUNT(*) AS n_sampled,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) <
        |  CASE event_type WHEN 'view' THEN '20' WHEN 'click' THEN '40' ELSE 'zz' END
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "text_tfidf" ->
      """WITH tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |    FROM documents) t
        |  GROUP BY doc_id, token),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
        |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token)
        |SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |  round(tf.tf * ln(CAST(n.n_docs + 1 AS DOUBLE) / (df.df + 1)), 6) AS tfidf
        |FROM tf JOIN df USING (token) CROSS JOIN n
        |WHERE tf.tf * ln(CAST(n.n_docs + 1 AS DOUBLE) / (df.df + 1)) > 1.5
        |ORDER BY doc_id, token""".stripMargin,
    // the bucketed layout changes the plan (no exchange), not the
    // result: the oracle is the plain join
    "q_bucketed_join" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // partition pruning changes what's scanned, not the result: the
    // oracle filters the flat table
    "q_partition_pruned" ->
      """SELECT user_id, COUNT(*) AS n_purchases,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE event_type = 'purchase'
        |GROUP BY user_id
        |HAVING COUNT(*) >= 3
        |ORDER BY user_id""".stripMargin,
    // the DeltaLite declared-partition twin scans a different LAYOUT
    // of the same rows — the oracle is the identical flat-table filter
    "q_deltalite_partition_pruned" ->
      """SELECT user_id, COUNT(*) AS n_purchases,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE event_type = 'purchase'
        |GROUP BY user_id
        |HAVING COUNT(*) >= 3
        |ORDER BY user_id""".stripMargin,
    // the catalog-SQL query reads the SAME rows through the named
    // DeltaLite table — the oracle is the flat-table aggregate
    "q_catalog_table_sql" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE event_type IN ('click', 'purchase')
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // two incremental COPY INTO passes must land exactly the two
    // event-type slices — the oracle is the flat-table aggregate
    "q_copy_into" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE event_type IN ('purchase', 'click')
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // the DML query's end state re-derived with CTEs: update = value
    // rewrite on the matched slice, delete = row filter, merge = join
    // add on the matched keys — double arithmetic is IEEE-identical in
    // both engines, decimal cast only at the final aggregate
    // composite-key MERGE + NOT MATCHED BY SOURCE end state re-derived
    // with a LEFT JOIN + CASE: matched groups accumulate the slice,
    // unmatched view-groups delete, other unmatched groups flag n=-1
    "q_dml_merge_multi" ->
      """WITH t0 AS (
        |  SELECT user_id, event_type, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
        |  FROM events GROUP BY user_id, event_type),
        |s AS (
        |  SELECT user_id, event_type, COUNT(*) AS n2,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS t2
        |  FROM events WHERE event_id % 3 = 0 GROUP BY user_id, event_type),
        |merged AS (
        |  SELECT t0.user_id, t0.event_type,
        |    CASE WHEN s.user_id IS NOT NULL THEN t0.n + s.n2 ELSE -1 END AS n,
        |    CASE WHEN s.user_id IS NOT NULL
        |         THEN CAST(t0.total + s.t2 AS DECIMAL(18,2))
        |         ELSE t0.total END AS total,
        |    (s.user_id IS NULL AND t0.event_type = 'view') AS deleted
        |  FROM t0 LEFT JOIN s
        |    ON t0.user_id = s.user_id AND t0.event_type = s.event_type)
        |SELECT event_type, COUNT(*) AS n_groups,
        |  CAST(SUM(n) AS BIGINT) AS sum_n,
        |  CAST(SUM(total) AS DOUBLE) AS sum_total
        |FROM merged WHERE NOT deleted
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_session_catalog_sql" ->
      """WITH base AS (
        |  SELECT event_type,
        |    CASE WHEN event_type = 'view' AND user_id < 20
        |         THEN value * 2 ELSE value END AS value
        |  FROM events
        |  WHERE event_type <> 'error'
        |    AND NOT (event_type = 'click' AND user_id < 10))
        |SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM base
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q_dml_sql" ->
      """WITH base AS (
        |  SELECT event_id, user_id,
        |    CASE WHEN event_type = 'view' AND user_id < 20
        |         THEN 'viewed' ELSE event_type END AS event_type,
        |    CASE WHEN event_type = 'view' AND user_id < 20
        |         THEN value * 2 ELSE value END AS value
        |  FROM events),
        |kept AS (
        |  SELECT * FROM base
        |  WHERE NOT (event_type = 'click' AND user_id < 10)),
        |merged AS (
        |  SELECT k.event_id, k.user_id, k.event_type,
        |    k.value + COALESCE(s.value, 0) AS value
        |  FROM kept k LEFT JOIN (
        |    SELECT event_id, value FROM events
        |    WHERE event_type = 'purchase' AND user_id < 5) s
        |  ON k.event_id = s.event_id)
        |SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM merged
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // sketch set-ops are exact below the sparse threshold, so plain
    // COUNT(DISTINCT) inclusion-exclusion is a legitimate oracle
    "q_sketch_setops" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
        |counts AS (SELECT event_type, COUNT(*) AS n FROM tu GROUP BY 1),
        |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b
        |          FROM counts a JOIN counts b ON a.event_type < b.event_type),
        |inter AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
        |                 COUNT(*) AS n_both
        |          FROM tu x JOIN tu y
        |            ON x.user_id = y.user_id AND x.event_type < y.event_type
        |          GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, ca.n AS n_a, cb.n AS n_b,
        |       ca.n + cb.n - COALESCE(i.n_both, 0) AS n_union,
        |       COALESCE(i.n_both, 0) AS n_common
        |FROM pairs p
        |JOIN counts ca ON ca.event_type = p.type_a
        |JOIN counts cb ON cb.event_type = p.type_b
        |LEFT JOIN inter i ON i.type_a = p.type_a AND i.type_b = p.type_b
        |ORDER BY p.type_a, p.type_b""".stripMargin,
    // the sketch is exact here (distinct items per group < k), so the
    // exact GROUP BY is a legitimate oracle; see Events.heavyHitters
    "q_distinct_sketch" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY 1
        |ORDER BY event_type""".stripMargin,
    "q_countmin" ->
      """SELECT event_type, COUNT(*) AS est
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sketch_reagg" ->
      """SELECT event_type, date_trunc('week', date_trunc('day', ts)) AS week,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY event_type, week""".stripMargin,
    "q_heavy_hitters" ->
      """SELECT CAST(user_id % 10 AS BIGINT) AS segment,
        |  event_type AS item, COUNT(*) AS cnt
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY segment, item""".stripMargin,
    // plain inequality join in the oracle; the Spark side buckets it
    "q_range_join" ->
      """WITH iv AS (
        |  SELECT range AS interval_id,
        |    TIMESTAMP '2024-01-01 00:00:00' + range * 3 * INTERVAL 1 DAY AS lo,
        |    TIMESTAMP '2024-01-01 00:00:00' + (range * 3 + 2) * INTERVAL 1 DAY AS hi
        |  FROM range(10))
        |SELECT iv.interval_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN iv ON e.ts >= iv.lo AND e.ts < iv.hi
        |GROUP BY iv.interval_id
        |ORDER BY iv.interval_id""".stripMargin,
    "q_events_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q_events_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(ts) AS t_start, MAX(ts) AS t_end,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM sessions
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q_modern_aggs" ->
      """SELECT event_type,
        |  CAST(count_if(value > 400.0) AS BIGINT) AS n_big,
        |  bool_and(value >= 0.0) AS all_nonneg,
        |  bool_or(value > 499.0) AS any_huge,
        |  max_by(user_id, event_id) AS latest_writer,
        |  min_by(user_id, event_id) AS first_writer
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q_latest_per_key" ->
      """WITH r AS (
        |  SELECT user_id, ts, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, ts AS last_ts, event_type AS last_type,
        |  value AS last_value
        |FROM r WHERE rn = 1
        |ORDER BY user_id""".stripMargin,
    "q_events_user_stats" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q_pivot_events" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
        |FROM events
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    // The Spark side DECODES real PNG bytes (javax.imageio) that were
    // rendered from this arithmetic gradient; the oracle recomputes the
    // same stats from the formula without any codec — agreement proves
    // the decode path end-to-end (sums are exact integers, one double
    // division on each side).
    "mm_image_decode" ->
      """WITH ids AS (SELECT CAST(range AS BIGINT) AS id FROM range(24)),
        |xs AS (SELECT range AS x FROM range(16)),
        |ys AS (SELECT range AS y FROM range(12)),
        |pix AS (
        |  SELECT id,
        |    (id * 37 + x * 16) % 256 AS r,
        |    (id * 11 + y * 21) % 256 AS g,
        |    (id * 53 + x + y) % 256 AS b
        |  FROM ids, xs, ys)
        |SELECT id, CAST(16 AS INTEGER) AS width, CAST(12 AS INTEGER) AS height,
        |  CAST(192 AS BIGINT) AS n_pixels,
        |  CAST(SUM(r) AS DOUBLE) / 192 AS mean_r,
        |  CAST(SUM(g) AS DOUBLE) / 192 AS mean_g,
        |  CAST(SUM(b) AS DOUBLE) / 192 AS mean_b
        |FROM pix GROUP BY id ORDER BY id""".stripMargin,
    // Spark decodes REAL multi-frame GIF videos (ImageIO sequence
    // reader, every 2nd frame); the oracle recomputes per-frame
    // luminance from the gradient formula with no codec.
    "mm_video_decode" ->
      """WITH ids AS (SELECT CAST(range AS BIGINT) AS id FROM range(12)),
        |fr AS (SELECT CAST(range AS INTEGER) AS frame FROM range(0, 8, 2)),
        |xs AS (SELECT range AS x FROM range(16)),
        |ys AS (SELECT range AS y FROM range(12)),
        |pix AS (SELECT id, frame,
        |    (id * 13 + frame * 29 + x * 3 + y * 5) % 256 AS g
        |  FROM ids, fr, xs, ys)
        |SELECT id, frame, CAST(8 AS INTEGER) AS n_frames,
        |  CAST(16 AS INTEGER) AS width, CAST(12 AS INTEGER) AS height,
        |  CAST(SUM(g) AS DOUBLE) / 192 AS mean_gray
        |FROM pix GROUP BY id, frame ORDER BY id, frame""".stripMargin,
    // Spark decodes REAL WAV bytes (javax.sound.sampled) synthesized
    // from this integer waveform; the oracle recomputes the stats from
    // the formula with no codec (integer sums exact, one division +
    // sqrt of identical doubles on each side).
    "mm_audio_decode" ->
      """WITH ids AS (SELECT CAST(range AS BIGINT) AS id FROM range(24)),
        |smp AS (SELECT range AS i FROM range(1600)),
        |s AS (SELECT id, ((id * 31 + i * 7) % 2001) - 1000 AS v FROM ids, smp)
        |SELECT id, CAST(8000 AS INTEGER) AS sample_rate,
        |  CAST(1600 AS BIGINT) AS n_samples,
        |  CAST(SUM(v) AS DOUBLE) / 1600 AS mean_amp,
        |  CAST(MAX(ABS(v)) AS INTEGER) AS peak,
        |  SQRT(CAST(SUM(v * v) AS DOUBLE) / 1600) AS rms
        |FROM s GROUP BY id ORDER BY id""".stripMargin,
    "mm_binary_meta" ->
      """SELECT CASE CAST(doc_id % 3 AS INTEGER)
        |         WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes
        |FROM documents
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
  )
}
