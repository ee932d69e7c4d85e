package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every entry in `queries` is one operator from the inventory; every
  * SQL-expressible one has a DuckDB oracle in `oracleSql` (hash-matched
  * by the driver at sf0.01). Names and output column names are kept
  * identical between the Spark plan and the oracle SQL.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q3ShippingPriority(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 / §2.2 ingest, conformance, validation, calendar
    "xml_ingest" -> (IngestQueries.xmlIngest _),
    "schema_conform" -> (IngestQueries.schemaConform _),
    "validate_constraints" -> (IngestQueries.validateConstraints _),
    "validate_referential" -> (IngestQueries.validateReferential _),
    "period_calendar" -> (IngestQueries.periodCalendar _),
    "q_profile" -> (IngestQueries.profileQ _),
    // §2.3 relational analytics
    "q1_pricing_summary" -> (RelationalQueries.q1PricingSummary _),
    "q3_shipping_priority" -> (RelationalQueries.q3ShippingPriority _),
    "q5_local_supplier" -> (RelationalQueries.q5LocalSupplier _),
    "q7_period_volume" -> (RelationalQueries.q7PeriodVolume _),
    "q_market_share" -> (RelationalQueries.qMarketShare _),
    "q_topk_per_group" -> (RelationalQueries.qTopKPerGroup _),
    "q_topk_native" -> (RelationalQueries.qTopKNative _),
    "q_delta_mom" -> (RelationalQueries.qDeltaMom _),
    "q_running_total" -> (RelationalQueries.qRunningTotal _),
    "q_semi_anti" -> (RelationalQueries.qSemiAnti _),
    "q_rollup" -> (RelationalQueries.qRollup _),
    "q_pivot" -> (RelationalQueries.qPivot _),
    "q_percentiles" -> (RelationalQueries.qPercentiles _),
    "q_percentiles_approx" -> (RelationalQueries.qPercentilesApprox _),
    "q_distinct_agg" -> (RelationalQueries.qDistinctAgg _),
    "q4_late_orders" -> (RelationalQueries.q4LateOrders _),
    "q17_small_qty" -> (RelationalQueries.q17SmallQty _),
    "q13_cust_distribution" -> (RelationalQueries.q13CustDistribution _),
    "q_rich_idle" -> (RelationalQueries.qRichIdle _),
    "q_skew_agg" -> (RelationalQueries.qSkewAgg _),
    "q_skew_join" -> (RelationalQueries.qSkewJoin _),
    "q_bloom_semi" -> (RelationalQueries.qBloomSemi _),
    "q_equidepth" -> (RelationalQueries.qEquidepth _),
    "q_ntile_by_group" -> (RelationalQueries.qNtileByGroup _),
    "q_decile_share" -> (RelationalQueries.qDecileShare _),
    "q_full_outer" -> (RelationalQueries.qFullOuter _),
    "q_distinct_hll_sketch" -> (RelationalQueries.qDistinctHllSketch _),
    "graph_pagerank" -> (GraphQueries.qPageRank _),
    "text_term_freq_cms" -> (TextQueries.termFreqCmsQ _),
    "text_collocations" -> (TextQueries.collocationsQ _),
    "text_compress_ratio" -> (TextQueries.compressRatioQ _),
    "text_quality_classifier" -> (TextQueries.qualityClassifierQ _),
    "text_chunk" -> (TextQueries.chunkQ(_, _)),
    "q_heavy_hitters_approx" -> (RelationalQueries.qHeavyHittersApprox _),
    "q_rank_family" -> (RelationalQueries.qRankFamily _),
    "q_string_funcs" -> (RelationalQueries.qStringFuncs _),
    "q_set_ops" -> (RelationalQueries.qSetOps _),
    "q_range_frame" -> (RelationalQueries.qRangeFrame _),
    "q_cube" -> (RelationalQueries.qCube _),
    "q_distinct_approx" -> (RelationalQueries.qDistinctApprox _),
    "q_parts_stats" -> (RelationalQueries.qPartsStats _),
    "q_collect_list" -> (RelationalQueries.qCollectList _),
    "q_grouping_sets" -> (RelationalQueries.qGroupingSets _),
    "q_window_nav" -> (RelationalQueries.qWindowNav _),
    "q_stats_family" -> (RelationalQueries.qStatsFamily _),
    "q6_revenue_band" -> (RelationalQueries.q6RevenueBand _),
    "q10_returned" -> (RelationalQueries.q10Returned _),
    "q14_promo_share" -> (RelationalQueries.q14PromoShare _),
    "q15_top_supplier" -> (RelationalQueries.q15TopSupplier _),
    "q18_big_orders" -> (RelationalQueries.q18BigOrders _),
    "q19_disjunctive" -> (RelationalQueries.q19Disjunctive _),
    "q2_min_cost_supplier" -> (RelationalQueries.q2MinCostSupplier _),
    "q9_product_profit" -> (RelationalQueries.q9ProductProfit _),
    "q11_important_parts" -> (RelationalQueries.q11ImportantParts _),
    "q16_supplier_variety" -> (RelationalQueries.q16SupplierVariety _),
    "q20_dominant_supplier" -> (RelationalQueries.q20DominantSupplier _),
    "q21_late_solo_supplier" -> (RelationalQueries.q21LateSoloSupplier _),
    // §2.4 events / time series
    "ev_tumbling_agg" -> (EventQueries.tumblingAgg _),
    "ev_hopping_agg" -> (EventQueries.hoppingAgg _),
    "ev_gap_fill" -> (EventQueries.gapFill _),
    "ev_paths" -> (EventQueries.paths _),
    "ev_streaming_parity" -> (EventQueries.streamingParity _),
    "ev_stream_sessions" -> (EventQueries.streamSessions _),
    "ev_stream_merge" -> (EventQueries.streamMerge _),
    "ev_stream_dedup" -> (EventQueries.streamDedup _),
    "ev_stream_join" -> (EventQueries.streamJoinQ _),
    "dedup_stats" -> (TextQueries.dedupStatsQ _),
    "validate_drift" -> (IngestQueries.validateDriftQ _),
    "text_pipeline_corpus" -> (TextQueries.pipelineCorpusQ _),
    "ev_sessionize" -> (EventQueries.sessionize _),
    "ev_funnel" -> (EventQueries.funnel _),
    "ev_asof_join" -> (EventQueries.asofJoin _),
    "ev_asof_tolerance" -> (EventQueries.asofToleranceQ _),
    "ev_json_extract" -> (EventQueries.jsonExtract _),
    "ev_interval_join" -> (EventQueries.intervalJoin _),
    "ev_retention" -> (EventQueries.retention _),
    "ev_session_window" -> (EventQueries.sessionWindow _),
    "ev_outliers" -> (EventQueries.outliers _),
    "ev_value_histogram" -> (EventQueries.valueHistogram _),
    "ev_cusum" -> (EventQueries.cusumQ _),
    // §2.5 dedup
    "dedup_exact" -> (TextQueries.dedupExactQ _),
    "dedup_ngram_jaccard" -> (TextQueries.dedupNgramJaccardQ _),
    "dedup_survivors" -> (TextQueries.dedupSurvivorsQ _),
    "dedup_survivors_inc" -> (TextQueries.dedupSurvivorsIncQ _),
    "dedup_corpus" -> (TextQueries.dedupCorpusQ _),
    "dedup_cluster_sizes" -> (TextQueries.dedupClusterSizesQ _),
    "dedup_minhash" -> (TextQueries.dedupMinhashQ _),
    "dedup_simhash" -> (TextQueries.dedupSimhashQ _),
    "dedup_embedding" -> (VectorQueries.dedupEmbedding _),
    "dedup_embedding_lsh" -> (VectorQueries.dedupEmbeddingLsh _),
    "dedup_semantic" -> (VectorQueries.dedupSemantic _),
    // §2.6 similarity search
    "ann_bruteforce" -> (VectorQueries.annBruteForce _),
    "ann_lsh" -> (VectorQueries.annLsh _),
    "ann_ivf" -> (VectorQueries.annIvf _),
    "ann_sq8" -> (VectorQueries.annSq8 _),
    "ann_ivf_sq8" -> (VectorQueries.annIvfSq8 _),
    "ann_pq" -> (VectorQueries.annPq _),
    "ann_ivf_pq" -> (VectorQueries.annIvfPq _),
    "knn_classify" -> (VectorQueries.knnClassify _),
    "knn_classify_lsh" -> (VectorQueries.knnClassifyLsh _),
    "knn_classify_ivf" -> (VectorQueries.knnClassifyIvf _),
    "vec_label_centroid" -> (VectorQueries.labelCentroid _),
    "vec_hard_negatives" -> (VectorQueries.vecHardNegatives _),
    // §2.7 text analysis
    "text_lang_id" -> (TextQueries.langIdQ _),
    "text_quality" -> (TextQueries.qualityQ _),
    "text_tokens" -> (TextQueries.tokensQ _),
    "text_fingerprint" -> (TextQueries.fingerprintQ _),
    "text_repetition" -> (TextQueries.repetitionQ _),
    "text_tfidf" -> (TextQueries.tfidfQ _),
    "text_bm25" -> (TextQueries.bm25Q _),
    "text_normalize" -> (TextQueries.normalizeQ _),
    "text_redact" -> (TextQueries.redactQ _),
    "text_corpus_stats" -> (TextQueries.corpusStatsQ _),
    "text_by_source" -> (TextQueries.bySourceQ _),
    "text_sample_split" -> (TextQueries.sampleSplitQ _),
    "text_stratified_split" -> (TextQueries.stratifiedSplitQ _),
    "text_ngram_lm" -> (TextQueries.ngramLmScoreQ _),
    "text_bpe_vocab" -> (TextQueries.bpeVocabQ _),
    "text_bpe_encode" -> (TextQueries.bpeEncodeQ _),
    "text_decontaminate" -> (TextQueries.decontaminateQ _),
    "text_decontaminate_chars" -> (TextQueries.decontaminateCharsQ _),
    "text_source_overlap" -> (TextQueries.sourceOverlapQ _),
    "text_fuzzy_pairs" -> (TextQueries.fuzzyPairsQ _),
    "text_topk_by_source" -> (TextQueries.topKBySourceQ _),
    "text_mixture_resample" -> (TextQueries.mixtureResampleQ _),
    "text_pack_contexts" -> (TextQueries.packContextsQ _),
    // §2.8 multimodal plumbing
    "mm_features" -> (VectorQueries.mmFeatures _),
    "mm_image_meta" -> (VectorQueries.mmImageMeta _),
    "mm_resize" -> (VectorQueries.mmResize _),
    "mm_keyframes" -> (VectorQueries.mmKeyframes _),
    "mm_audio_meta" -> (VectorQueries.mmAudioMeta _),
    "mm_video_meta" -> (VectorQueries.mmVideoMeta _),
    "mm_video_frames" -> (VectorQueries.mmVideoFrames _)
  )

  /** DuckDB-equivalent SQL per query (omitted for hash-family ops whose
    * exact constants aren't SQL-expressible: dedup_minhash,
    * dedup_simhash, ann_lsh — those get rows-only checks plus recall
    * specs in the test suite). */
  def oracleSql: Map[String, String] = OracleSql.all
}
