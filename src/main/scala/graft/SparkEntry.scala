package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` covers SURVEY §2's operator inventory (keys prefixed by the
  * §2 operator id) plus the north-star dedup/similarity/text/multimodal
  * extensions; `oracleSql` carries the DuckDB-equivalent SQL for every
  * SQL-expressible entry (4 approximate/imperative ops are rows-only).
  */
object SparkEntry {

  /** Flagship: the reference's core product — the CDC validation suite
    * (checks 1–6) run source-vs-sink on a sink with injected drift
    * (duplicates, orphans, lost rows), as a report DataFrame.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.validationSuite(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A: aggregation checks
    "a1_rowcount_smoke" -> Queries.a1RowcountSmoke,
    "a2_distinct_pk" -> Queries.a2DistinctPk,
    "a3_dup_profile" -> Queries.a3DupProfile,
    "a4_dup_groups" -> Queries.a4DupGroups,
    "a5_freshness_lag" -> Queries.a5FreshnessLag,
    "a6_ts_range" -> Queries.a6TsRange,
    "a7_pk_range" -> Queries.a7PkRange,
    "c7_null_ratios" -> Queries.c7NullRatios,
    "c9_agg_invariants" -> Queries.c9AggInvariants,
    // J: joins
    "j1_anti_join" -> Queries.j1AntiJoin,
    "j3_row_diff" -> Queries.j3RowDiff,
    "j4_semi_join" -> Queries.j4SemiJoin,
    // P: filters / projections
    "p1_include_filter" -> Queries.p1IncludeFilter,
    "p2_topic_regex" -> Queries.p2TopicRegex,
    "p4_route" -> Queries.p4Route,
    "p9_point_lookup" -> Queries.p9PointLookup,
    "p10_null_pk" -> Queries.p10NullPk,
    // F: scalar conversions
    "f1f4_typeconv" -> Queries.f1f4Typeconv,
    "f5f7_copy_encode" -> Queries.f5f7CopyEncode,
    // W: windows
    "w1_latest_per_key" -> Queries.w1LatestPerKey,
    "w2_dup_rank" -> Queries.w2DupRank,
    // CDC pipeline semantics
    "p3_cdc_unwrap" -> Queries.cdcUnwrap,
    "s7_cdc_upsert_apply" -> Queries.cdcUpsertApply,
    "t3_cdc_materialize" -> Queries.cdcMaterialize,
    "t1_changelog_stats" -> Queries.cdcChangelogStats,
    // O/X: sort / limit / sample / set ops
    "o1_pagination" -> Queries.o1Pagination,
    "o2_topk" -> Queries.o2Topk,
    "o3_sample" -> Queries.o3Sample,
    "x1_except" -> Queries.x1Except,
    "x2_intersect" -> Queries.x2Intersect,
    "x3_union" -> Queries.x3Union,
    // reference checks 1/5/10 (schema shape, recent activity, coverage)
    "c1_schema_shape" -> QueriesChecks.c1SchemaShape,
    "c5_recent_activity" -> QueriesChecks.c5RecentActivity,
    "c6_delete_semantics" -> QueriesChecks.c6DeleteSemantics,
    "c8_sample_content" -> QueriesChecks.c8SampleContent,
    "c10_cdc_coverage" -> QueriesChecks.c10CdcCoverage,
    // analytic joins/aggs + snapshot scan
    "v0_validation_suite" -> Queries.validationSuite,
    "q1_agg" -> Queries.q1Agg,
    "q6_rollup" -> QueriesAnalytic.q6Rollup,
    "q7_pivot" -> QueriesAnalytic.q7Pivot,
    "w6_distribution" -> QueriesAnalytic.w6Distribution,
    "w3_running_sum" -> QueriesAnalytic.w3RunningSum,
    "w4_lead_lag" -> QueriesAnalytic.w4LeadLag,
    "w5_sessionize" -> QueriesAnalytic.w5Sessionize,
    "a9_percentiles" -> QueriesAnalytic.a9Percentiles,
    "a2_distinct_pk_approx" -> QueriesAnalytic.a2Approx,
    "h1_histogram" -> QueriesAnalytic.h1Histogram,
    "j5_enrich" -> QueriesAnalytic.j5Enrich,
    "j6_asof" -> QueriesAnalytic.j6Asof,
    "q8_cube" -> QueriesAnalytic.q8Cube,
    "w7_range_window" -> QueriesAnalytic.w7RangeWindow,
    "q3_topk_join" -> Queries.q3TopkJoin,
    "q5_star_join" -> Queries.q5StarJoin,
    "s2_snap_load" -> Queries.snapLoad,
    // text analysis
    "tx_token_count" -> QueriesExt.txTokenCount,
    "tx_lang_id" -> QueriesExt.txLangId,
    "tx_quality" -> QueriesExt.txQuality,
    "tx_fingerprint" -> QueriesExt.txFingerprint,
    "tx_winnow" -> QueriesExt.txWinnow,
    "tx_vocab" -> QueriesExt.txVocab,
    "tx_tfidf" -> QueriesExt.txTfidf,
    "tx_surprisal" -> QueriesExt.txSurprisal,
    "tx_redact" -> QueriesExt.txRedact,
    // dedup
    "dd_exact_keep" -> QueriesExt.ddExactKeep,
    "dd_exact_groups" -> QueriesExt.ddExactGroups,
    "dd_ngram_jaccard" -> QueriesExt.ddNgramJaccard,
    "dd_minhash_lsh" -> QueriesExt.ddMinhashLsh,
    "dd_simhash" -> QueriesExt.ddSimhash,
    "dd_incremental" -> QueriesExt.ddIncremental,
    "dd_winnow_overlap" -> QueriesExt.ddWinnowOverlap,
    "dd_cluster" -> QueriesExt.ddCluster,
    "dd_cluster_stats" -> QueriesExt.ddClusterStats,
    // similarity search
    "sim_cosine_topk" -> QueriesExt.simCosineTopk,
    "sim_cosine_neardup" -> QueriesExt.simCosineNeardup,
    "sim_ann_lsh" -> QueriesExt.simAnnLsh,
    "sim_ann_ivf" -> QueriesExt.simAnnIvf,
    "sim_ann_lsh_cand" -> QueriesExt.simAnnLshCand,
    "sim_ann_ivf_cand" -> QueriesExt.simAnnIvfCand,
    "dd_semdedup" -> QueriesExt.ddSemdedup,
    "cu_dedup_keep_best" -> QueriesExt.cuDedupKeepBest,
    "sim_ann_recall" -> QueriesExt.simAnnRecall,
    "dd_embed_neardup" -> QueriesExt.ddEmbedNeardup,
    "dd_embed_neardup_hi" -> QueriesExt.ddEmbedNeardupHi,
    "dd_source_overlap" -> QueriesExt.ddSourceOverlap,
    // corpus curation
    "cu_stratified_sample" -> QueriesExt.cuStratifiedSample,
    "cu_corpus_curate" -> QueriesExt.cuCorpusCurate,
    "cu_chunk" -> QueriesExt.cuChunk,
    "cu_decontaminate" -> QueriesExt.cuDecontaminate,
    "cu_decontaminate_sem" -> QueriesExt.cuDecontaminateSem,
    "cu_token_mix" -> QueriesExt.cuTokenMix,
    "cu_pack" -> QueriesExt.cuPack,
    "cu_mix_sample" -> QueriesExt.cuMixSample,
    "cu_temperature_sample" -> QueriesExt.cuTemperatureSample,
    "cu_dedup_pipeline" -> QueriesExt.cuDedupPipeline,
    "cu_dedup_semantic" -> QueriesExt.cuDedupSemantic,
    "cu_quality_threshold" -> QueriesExt.cuQualityThreshold,
    "sim_quantize_int8" -> QueriesExt.simQuantizeInt8,
    "tx_repetition" -> QueriesExt.txRepetition,
    // multimodal
    "mm_payload_stats" -> QueriesExt.mmPayloadStats,
    "mm_frame_sample" -> QueriesExt.mmFrameSample,
    "mm_resize" -> QueriesExt.mmResize,
    "mm_features" -> QueriesExt.mmFeatures)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — every entry, including the approximate
    * ANN tiers: given fixed seeds (hyperplane splitmix chain,
    * md5-seeded centroids) and corpus-derived geometry the oracle
    * recomputes from `COUNT(*)` in exact integer/correctly-rounded
    * arithmetic, the candidate sets, exact-cosine ranks and recall
    * fractions are all deterministic, so `sim_ann_lsh`, `sim_ann_ivf`
    * and `sim_ann_recall` replay end to end in DuckDB at PRODUCTION
    * geometry, alongside their pinned `_cand` stage companions.
    */
  def oracleSql: Map[String, String] = Map(
    "a1_rowcount_smoke" -> Queries.a1Sql,
    "a2_distinct_pk" -> Queries.a2Sql,
    "a3_dup_profile" -> Queries.a3Sql,
    "a4_dup_groups" -> Queries.a4Sql,
    "a5_freshness_lag" -> Queries.a5Sql,
    "a6_ts_range" -> Queries.a6Sql,
    "a7_pk_range" -> Queries.a7Sql,
    "c7_null_ratios" -> Queries.c7Sql,
    "c9_agg_invariants" -> Queries.c9Sql,
    "c1_schema_shape" -> QueriesChecks.c1Sql,
    "c5_recent_activity" -> QueriesChecks.c5Sql,
    "c6_delete_semantics" -> QueriesChecks.c6Sql,
    "c8_sample_content" -> QueriesChecks.c8Sql,
    "c10_cdc_coverage" -> QueriesChecks.c10Sql,
    "j1_anti_join" -> Queries.j1Sql,
    "j3_row_diff" -> Queries.j3Sql,
    "j4_semi_join" -> Queries.j4Sql,
    "p1_include_filter" -> Queries.p1Sql,
    "p2_topic_regex" -> Queries.p2Sql,
    "p4_route" -> Queries.p4Sql,
    "p9_point_lookup" -> Queries.p9Sql,
    "p10_null_pk" -> Queries.p10Sql,
    "f1f4_typeconv" -> Queries.f1f4Sql,
    "f5f7_copy_encode" -> Queries.f5f7Sql,
    "w1_latest_per_key" -> Queries.w1Sql,
    "w2_dup_rank" -> Queries.w2Sql,
    "p3_cdc_unwrap" -> Queries.cdcUnwrapSql,
    "s7_cdc_upsert_apply" -> Queries.cdcUpsertApplySql,
    "t3_cdc_materialize" -> Queries.cdcMaterializeSql,
    "t1_changelog_stats" -> Queries.cdcChangelogStatsSql,
    "o1_pagination" -> Queries.o1Sql,
    "o2_topk" -> Queries.o2Sql,
    "o3_sample" -> Queries.o3Sql,
    "x1_except" -> Queries.x1Sql,
    "x2_intersect" -> Queries.x2Sql,
    "x3_union" -> Queries.x3Sql,
    "q1_agg" -> Queries.q1Sql,
    "q6_rollup" -> QueriesAnalytic.q6Sql,
    "q7_pivot" -> QueriesAnalytic.q7Sql,
    "w6_distribution" -> QueriesAnalytic.w6Sql,
    "w3_running_sum" -> QueriesAnalytic.w3Sql,
    "w4_lead_lag" -> QueriesAnalytic.w4Sql,
    "w5_sessionize" -> QueriesAnalytic.w5Sql,
    "a9_percentiles" -> QueriesAnalytic.a9Sql,
    "a2_distinct_pk_approx" -> QueriesAnalytic.a2ApproxSql,
    "h1_histogram" -> QueriesAnalytic.h1Sql,
    "j5_enrich" -> QueriesAnalytic.j5Sql,
    "j6_asof" -> QueriesAnalytic.j6Sql,
    "q8_cube" -> QueriesAnalytic.q8Sql,
    "w7_range_window" -> QueriesAnalytic.w7Sql,
    "q3_topk_join" -> Queries.q3Sql,
    "q5_star_join" -> Queries.q5Sql,
    "s2_snap_load" -> Queries.snapLoadSql,
    "v0_validation_suite" -> Queries.validationSuiteSql,
    "tx_token_count" -> QueriesExt.txTokenCountSql,
    "tx_lang_id" -> QueriesExt.txLangIdSql,
    "tx_quality" -> QueriesExt.txQualitySql,
    "tx_fingerprint" -> QueriesExt.txFingerprintSql,
    "tx_winnow" -> QueriesExt.txWinnowSql,
    "tx_vocab" -> QueriesExt.txVocabSql,
    "tx_tfidf" -> QueriesExt.txTfidfSql,
    "tx_surprisal" -> QueriesExt.txSurprisalSql,
    "tx_redact" -> QueriesExt.txRedactSql,
    "cu_mix_sample" -> QueriesExt.cuMixSampleSql,
    "cu_temperature_sample" -> QueriesExt.cuTemperatureSampleSql,
    "cu_dedup_pipeline" -> QueriesExt.cuDedupPipelineSql,
    "cu_dedup_semantic" -> QueriesExt.cuDedupSemanticSql,
    "cu_quality_threshold" -> QueriesExt.cuQualityThresholdSql,
    "sim_quantize_int8" -> QueriesExt.simQuantizeInt8Sql,
    "dd_exact_keep" -> QueriesExt.ddExactKeepSql,
    "dd_exact_groups" -> QueriesExt.ddExactGroupsSql,
    "dd_ngram_jaccard" -> QueriesExt.ddNgramJaccardSql,
    "dd_minhash_lsh" -> QueriesExt.ddMinhashLshSql,
    "dd_simhash" -> QueriesExt.ddSimhashSql,
    "dd_incremental" -> QueriesExt.ddIncrementalSql,
    "dd_winnow_overlap" -> QueriesExt.ddWinnowOverlapSql,
    "dd_cluster" -> QueriesExt.ddClusterSql,
    "dd_cluster_stats" -> QueriesExt.ddClusterStatsSql,
    "sim_cosine_topk" -> QueriesExt.simCosineTopkSql,
    "sim_cosine_neardup" -> QueriesExt.simCosineNeardupSql,
    "sim_ann_lsh" -> QueriesExt.simAnnLshSql,
    "sim_ann_ivf" -> QueriesExt.simAnnIvfSql,
    "sim_ann_recall" -> QueriesExt.simAnnRecallSql,
    "sim_ann_lsh_cand" -> QueriesExt.simAnnLshCandSql,
    "sim_ann_ivf_cand" -> QueriesExt.simAnnIvfCandSql,
    "dd_semdedup" -> QueriesExt.ddSemdedupSql,
    "cu_dedup_keep_best" -> QueriesExt.cuDedupKeepBestSql,
    "dd_embed_neardup" -> QueriesExt.ddEmbedNeardupSql,
    "dd_embed_neardup_hi" -> QueriesExt.ddEmbedNeardupHiSql,
    "dd_source_overlap" -> QueriesExt.ddSourceOverlapSql,
    "cu_stratified_sample" -> QueriesExt.cuStratifiedSampleSql,
    "cu_corpus_curate" -> QueriesExt.cuCorpusCurateSql,
    "cu_chunk" -> QueriesExt.cuChunkSql,
    "cu_decontaminate" -> QueriesExt.cuDecontaminateSql,
    "cu_decontaminate_sem" -> QueriesExt.cuDecontaminateSemSql,
    "cu_token_mix" -> QueriesExt.cuTokenMixSql,
    "cu_pack" -> QueriesExt.cuPackSql,
    "tx_repetition" -> QueriesExt.txRepetitionSql,
    "mm_payload_stats" -> QueriesExt.mmPayloadStatsSql,
    "mm_frame_sample" -> QueriesExt.mmFrameSampleSql,
    "mm_resize" -> QueriesExt.mmResizeSql,
    "mm_features" -> QueriesExt.mmFeaturesSql)
}
