"""Central registry: query name -> (Spark callable, DuckDB oracle SQL|None).

Consumed by __spark_entry__.py (driver contract), tests/, and bench.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import catalog, catalog_data, catalog_generic

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (spark_fn, oracle_sql or None for rows-only checks)
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {
    # --- round 8 additions ---
    "severity_transitions": (
        catalog.q_severity_transitions,
        catalog.SQL_SEVERITY_TRANSITIONS,
    ),
    "ts_gorilla_size": (
        catalog.q_ts_gorilla_size,
        catalog.SQL_TS_GORILLA_SIZE,
    ),
    "bucket_rollover_estimate": (
        catalog.q_bucket_rollover_estimate,
        catalog.SQL_BUCKET_ROLLOVER_ESTIMATE,
    ),
    "cluster_split_assign": (
        catalog_data.q_cluster_split_assign,
        catalog_data.SQL_CLUSTER_SPLIT_ASSIGN,
    ),
    "bm25_topk": (
        catalog_data.q_bm25_topk,
        catalog_data.SQL_BM25_TOPK,
    ),
    "purchase_window_rollup": (
        catalog_generic.q_purchase_window_rollup,
        catalog_generic.SQL_PURCHASE_WINDOW_ROLLUP,
    ),
    "admin_commands_roundtrip": (
        catalog.q_admin_commands_roundtrip,
        catalog.SQL_ADMIN_COMMANDS_ROUNDTRIP,
    ),
    "stream_watermark_counts": (
        catalog.q_stream_watermark_counts,
        catalog.SQL_STREAM_WATERMARK_COUNTS,
    ),
    "stream_stream_join": (
        catalog_generic.q_stream_stream_join,
        catalog_generic.SQL_STREAM_STREAM_JOIN,
    ),
    "stream_stream_join_outer": (
        catalog_generic.q_stream_stream_join_outer,
        catalog_generic.SQL_STREAM_STREAM_JOIN_OUTER,
    ),
    "stream_stream_join_full": (
        catalog_generic.q_stream_stream_join_full,
        catalog_generic.SQL_STREAM_STREAM_JOIN_FULL,
    ),
    "curate_round8": (
        catalog_data.q_curate_round8,
        catalog_data.SQL_CURATE_ROUND8,
    ),
    "pii_redact_rewrite": (
        catalog_data.q_pii_redact_rewrite,
        catalog_data.SQL_PII_REDACT_REWRITE,
    ),
    "stream_session_windows": (
        catalog_generic.q_stream_session_windows,
        catalog_generic.SQL_STREAM_SESSION_WINDOWS,
    ),
    "stream_dedup_watermark": (
        catalog_generic.q_stream_dedup_watermark,
        catalog_generic.SQL_STREAM_DEDUP_WATERMARK,
    ),
    # --- round 7 additions (never driver-checked: keep at the front) ---
    "lm_quality_score": (
        catalog_data.q_lm_quality_score,
        catalog_data.SQL_LM_QUALITY_SCORE,
    ),
    "lm_backoff_census": (
        catalog_data.q_lm_backoff_census,
        catalog_data.SQL_LM_BACKOFF_CENSUS,
    ),
    "ridge_probe": (
        catalog_data.q_ridge_probe,
        catalog_data.SQL_RIDGE_PROBE,
    ),
    "boilerplate_spans": (
        catalog_data.q_boilerplate_spans,
        catalog_data.SQL_BOILERPLATE_SPANS,
    ),
    "boilerplate_by_source": (
        catalog_data.q_boilerplate_by_source,
        catalog_data.SQL_BOILERPLATE_BY_SOURCE,
    ),
    "quality_filter_report": (
        catalog_data.q_quality_filter_report,
        catalog_data.SQL_QUALITY_FILTER_REPORT,
    ),
    "pair_pagerank": (
        catalog_data.q_pair_pagerank,
        catalog_data.SQL_PAIR_PAGERANK,
    ),
    "pagerank_canonical": (
        catalog_data.q_pagerank_canonical,
        catalog_data.SQL_PAGERANK_CANONICAL,
    ),
    "attribution_last_touch": (
        catalog_generic.q_attribution_last_touch,
        catalog_generic.SQL_ATTRIBUTION_LAST_TOUCH,
    ),
    "level_freshness_report": (
        catalog.q_level_freshness_report,
        catalog.SQL_LEVEL_FRESHNESS_REPORT,
    ),
    "chunk_dedup_rewrite": (
        catalog_data.q_chunk_dedup_rewrite,
        catalog_data.SQL_CHUNK_DEDUP_REWRITE,
    ),
    "audio_vad_segments": (
        catalog_data.q_audio_vad_segments,
        catalog_data.SQL_AUDIO_VAD_SEGMENTS,
    ),
    "curate_round7": (
        catalog_data.q_curate_round7,
        catalog_data.SQL_CURATE_ROUND7,
    ),
    "image_phash_mixed_codec": (
        catalog_data.q_image_phash_mixed_codec,
        catalog_data.SQL_IMAGE_PHASH_MIXED_CODEC,
    ),
    # --- round 4 additions ---
    "lagged_correlation_1h": (
        catalog.q_lagged_correlation_1h,
        catalog.SQL_LAGGED_CORRELATION_1H,
    ),
    "value_histogram": (catalog.q_value_histogram, catalog.SQL_VALUE_HISTOGRAM),
    "channel_outliers_mad": (
        catalog.q_channel_outliers_mad,
        catalog.SQL_CHANNEL_OUTLIERS_MAD,
    ),
    "plot_query_240px": (catalog.q_plot_query_240px, catalog.SQL_PLOT_QUERY_240PX),
    "plot_downsample_m4": (
        catalog.q_plot_downsample_m4,
        catalog.SQL_PLOT_DOWNSAMPLE_M4,
    ),
    "counter_rate_6h": (catalog.q_counter_rate_6h, catalog.SQL_COUNTER_RATE_6H),
    "resample_linear_1h": (
        catalog.q_resample_linear_1h,
        catalog.SQL_RESAMPLE_LINEAR_1H,
    ),
    "compact_zorder_invariance": (
        catalog.q_compact_zorder_invariance,
        catalog.SQL_COMPACT_INVARIANCE,
    ),
    "store_time_travel": (catalog.q_store_time_travel, catalog.SQL_STORE_TIME_TRAVEL),
    "store_schema_evolution": (
        catalog.q_store_schema_evolution,
        catalog.SQL_STORE_SCHEMA_EVOLUTION,
    ),
    "store_schema_reverse": (
        catalog.q_store_schema_reverse,
        catalog.SQL_STORE_SCHEMA_REVERSE,
    ),
    "approx_distinct_audit": (
        catalog_generic.q_approx_distinct_audit,
        catalog_generic.SQL_APPROX_DISTINCT_AUDIT,
    ),
    "semantic_dedup": (catalog_data.q_semantic_dedup, catalog_data.SQL_SEMANTIC_DEDUP),
    "pii_scan_by_source": (
        catalog_data.q_pii_scan_by_source,
        catalog_data.SQL_PII_SCAN_BY_SOURCE,
    ),
    "substring_dup_spans": (
        catalog_data.q_substring_dup_spans,
        catalog_data.SQL_SUBSTRING_DUP_SPANS,
    ),
    "embedding_quantize_audit": (
        catalog_data.q_embedding_quantize_audit,
        catalog_data.SQL_EMBEDDING_QUANTIZE_AUDIT,
    ),
    "dsir_importance": (
        catalog_data.q_dsir_importance,
        catalog_data.SQL_DSIR_IMPORTANCE,
    ),
    "threshold_crossings": (
        catalog.q_threshold_crossings,
        catalog.SQL_THRESHOLD_CROSSINGS,
    ),
    "orc_ingest_roundtrip_1h": (
        catalog.q_orc_ingest_roundtrip_1h,
        catalog.SQL_ORC_INGEST_ROUNDTRIP_1H,
    ),
    # --- round 5 additions ---
    "store_cdc_diff": (catalog.q_store_cdc_diff, catalog.SQL_STORE_CDC_DIFF),
    "ngram_novelty": (
        catalog_data.q_ngram_novelty,
        catalog_data.SQL_NGRAM_NOVELTY,
    ),
    "context_chunks": (
        catalog_data.q_context_chunks,
        catalog_data.SQL_CONTEXT_CHUNKS,
    ),
    "group_split_guard": (
        catalog_data.q_group_split_guard,
        catalog_data.SQL_GROUP_SPLIT_GUARD,
    ),
    "curriculum_bins": (
        catalog_data.q_curriculum_bins,
        catalog_data.SQL_CURRICULUM_BINS,
    ),
    # --- round 6 (this round) additions: full DBR wire coverage ---
    "ca_typed_roundtrip_1h": (
        catalog.q_ca_typed_roundtrip_1h,
        catalog.SQL_CA_TYPED_ROUNDTRIP_1H,
    ),
    "ca_wire_matrix": (catalog.q_ca_wire_matrix, catalog.SQL_CA_WIRE_MATRIX),
    "ca_ctrl_metadata": (
        catalog.q_ca_ctrl_metadata,
        catalog.SQL_CA_CTRL_METADATA,
    ),
    "ca_live_subscribe_typed": (
        catalog.q_ca_live_subscribe_typed,
        catalog.SQL_CA_LIVE_SUBSCRIBE_TYPED,
    ),
    "retention_fallback_plan": (
        catalog.q_retention_fallback_plan,
        catalog.SQL_RETENTION_FALLBACK_PLAN,
    ),
    "split_leakage_audit": (
        catalog_data.q_split_leakage_audit,
        catalog_data.SQL_SPLIT_LEAKAGE_AUDIT,
    ),
    "hard_negative_mining": (
        catalog_data.q_hard_negative_mining,
        catalog_data.SQL_HARD_NEGATIVE_MINING,
    ),
    "json_v1_ca_wire": (catalog.q_json_v1_ca_wire, catalog.SQL_JSON_V1_CA_WIRE),
    "store_typed_roundtrip": (
        catalog.q_store_typed_roundtrip,
        catalog.SQL_STORE_TYPED_ROUNDTRIP,
    ),
    "dim_variance_selection_recall": (
        catalog_data.q_dim_variance_selection_recall,
        catalog_data.SQL_DIM_VARIANCE_SELECTION_RECALL,
    ),
    "image_resize_dhash": (
        catalog_data.q_image_resize_dhash,
        catalog_data.SQL_IMAGE_RESIZE_DHASH,
    ),
    "audio_downsample_features": (
        catalog_data.q_audio_downsample_features,
        catalog_data.SQL_AUDIO_DOWNSAMPLE_FEATURES,
    ),
    "pca_top_component": (
        catalog_data.q_pca_top_component,
        catalog_data.SQL_PCA_TOP_COMPONENT,
    ),
    "decimate_1h_auto_skew": (
        catalog.q_decimate_1h_auto_skew,
        catalog.SQL_DECIMATE_1H,
    ),
    # --- round 6 additions ---
    "cusum_changepoints": (
        catalog.q_cusum_changepoints,
        catalog.SQL_CUSUM_CHANGEPOINTS,
    ),
    "distribution_drift": (
        catalog.q_distribution_drift,
        catalog.SQL_DISTRIBUTION_DRIFT,
    ),
    "sax_motifs": (catalog.q_sax_motifs, catalog.SQL_SAX_MOTIFS),
    "cdc_chunk_dedup": (
        catalog_data.q_cdc_chunk_dedup,
        catalog_data.SQL_CDC_CHUNK_DEDUP,
    ),
    "mixture_temperature_alloc": (
        catalog_data.q_mixture_temperature_alloc,
        catalog_data.SQL_MIXTURE_TEMPERATURE_ALLOC,
    ),
    "image_dhash_near_dup": (
        catalog_data.q_image_dhash_near_dup,
        catalog_data.SQL_IMAGE_DHASH_NEAR_DUP,
    ),
    "channel_acf_1h": (catalog.q_channel_acf_1h, catalog.SQL_CHANNEL_ACF_1H),
    "channel_trend_1h": (
        catalog.q_channel_trend_1h,
        catalog.SQL_CHANNEL_TREND_1H,
    ),
    "ann_recall_audit": (
        catalog_data.q_ann_recall_audit,
        catalog_data.SQL_ANN_RECALL_AUDIT,
    ),
    "cms_heavy_hitters": (
        catalog_data.q_cms_heavy_hitters,
        catalog_data.SQL_CMS_HEAVY_HITTERS,
    ),
    "lsh_recall_audit": (
        catalog_data.q_lsh_recall_audit,
        catalog_data.SQL_LSH_RECALL_AUDIT,
    ),
    "quality_ks_by_source": (
        catalog_data.q_quality_ks_by_source,
        catalog_data.SQL_QUALITY_KS_BY_SOURCE,
    ),
    "array_elementwise_stats": (
        catalog.q_array_elementwise_stats,
        catalog.SQL_ARRAY_ELEMENTWISE_STATS,
    ),
    "containment_pairs": (
        catalog_data.q_containment_pairs,
        catalog_data.SQL_CONTAINMENT_PAIRS,
    ),
    # --- round 7 additions ---
    "enabling_link_multi": (
        catalog.q_enabling_link_multi,
        catalog.SQL_ENABLING_LINK_MULTI,
    ),
    "containment_pairs_lsh": (
        catalog_data.q_containment_pairs_lsh,
        catalog_data.SQL_CONTAINMENT_PAIRS_LSH,
    ),
    "containment_recall_audit": (
        catalog_data.q_containment_recall_audit,
        catalog_data.SQL_CONTAINMENT_RECALL_AUDIT,
    ),
    "pair_table_incremental": (
        catalog_data.q_pair_table_incremental,
        catalog_data.SQL_PAIR_TABLE_INCREMENTAL,
    ),
    "pair_table_streams": (
        catalog_data.q_pair_table_streams,
        catalog_data.SQL_PAIR_TABLE_STREAMS,
    ),
    "image_dhash_mixed_codec": (
        catalog_data.q_image_dhash_mixed_codec,
        catalog_data.SQL_IMAGE_DHASH_NEAR_DUP,
    ),
    "ca_ingest_roundtrip_1h": (
        catalog.q_ca_ingest_roundtrip_1h,
        catalog.SQL_CA_INGEST_ROUNDTRIP_1H,
    ),
    "bloom_decontam_audit": (
        catalog_data.q_bloom_decontam_audit,
        catalog_data.SQL_BLOOM_DECONTAM_AUDIT,
    ),
    "ca_array_roundtrip_stats": (
        catalog_data.q_ca_array_roundtrip_stats,
        catalog_data.SQL_CA_ARRAY_ROUNDTRIP_STATS,
    ),
    "epoch_shuffle": (
        catalog_data.q_epoch_shuffle,
        catalog_data.SQL_EPOCH_SHUFFLE,
    ),
    "pack_efficiency": (
        catalog_data.q_pack_efficiency,
        catalog_data.SQL_PACK_EFFICIENCY,
    ),
    "audio_features_wav": (
        catalog_data.q_audio_features_wav,
        catalog_data.SQL_AUDIO_FEATURES_WAV,
    ),
    "video_frame_sample": (
        catalog_data.q_video_frame_sample,
        catalog_data.SQL_VIDEO_FRAME_SAMPLE,
    ),
    "ca_live_subscribe": (
        catalog.q_ca_live_subscribe,
        catalog.SQL_CA_LIVE_SUBSCRIBE,
    ),
    "bpe_merges": (
        catalog_data.q_bpe_merges,
        catalog_data.SQL_BPE_MERGES,
    ),
    "audio_fingerprint_near_dup": (
        catalog_data.q_audio_fingerprint_near_dup,
        catalog_data.SQL_AUDIO_FINGERPRINT_NEAR_DUP,
    ),
    "bpe_tokenize_audit": (
        catalog_data.q_bpe_tokenize_audit,
        catalog_data.SQL_BPE_TOKENIZE_AUDIT,
    ),
    "pq_codebook_audit": (
        catalog_data.q_pq_codebook_audit,
        catalog_data.SQL_PQ_CODEBOOK_AUDIT,
    ),
    "pq_adc_recall": (
        catalog_data.q_pq_adc_recall,
        catalog_data.SQL_PQ_ADC_RECALL,
    ),
    "store_rename_invariance": (
        catalog.q_store_rename_invariance,
        catalog.SQL_STORE_RENAME_INVARIANCE,
    ),
    "weighted_sample_per_lang": (
        catalog_data.q_weighted_sample_per_lang,
        catalog_data.SQL_WEIGHTED_SAMPLE_PER_LANG,
    ),
    "seasonal_hod_anomalies": (
        catalog.q_seasonal_hod_anomalies,
        catalog.SQL_SEASONAL_HOD_ANOMALIES,
    ),
    "ivfpq_adc_recall": (
        catalog_data.q_ivfpq_adc_recall,
        catalog_data.SQL_IVFPQ_ADC_RECALL,
    ),
    "pq_staleness_audit": (
        catalog_data.q_pq_staleness_audit,
        catalog_data.SQL_PQ_STALENESS_AUDIT,
    ),
    "level_backfill_6h": (
        catalog.q_level_backfill_6h,
        catalog.SQL_LEVEL_BACKFILL_6H,
    ),
    "shuffle_skew_report": (
        catalog.q_shuffle_skew_report,
        catalog.SQL_SHUFFLE_SKEW_REPORT,
    ),
    "ewma_by_channel": (
        catalog.q_ewma_by_channel,
        catalog.SQL_EWMA_BY_CHANNEL,
    ),
    "dim_truncation_recall": (
        catalog_data.q_dim_truncation_recall,
        catalog_data.SQL_DIM_TRUNCATION_RECALL,
    ),
    "store_delete_invariance": (
        catalog.q_store_delete_invariance,
        catalog.SQL_STORE_DELETE_INVARIANCE,
    ),
    "zipf_vocab_profile": (
        catalog_data.q_zipf_vocab_profile,
        catalog_data.SQL_ZIPF_VOCAB_PROFILE,
    ),
    "channel_health_report": (
        catalog.q_channel_health_report,
        catalog.SQL_CHANNEL_HEALTH_REPORT,
    ),
    "wsample_bias_audit": (
        catalog_data.q_wsample_bias_audit,
        catalog_data.SQL_WSAMPLE_BIAS_AUDIT,
    ),
    "seasonal_profile_incremental": (
        catalog.q_seasonal_profile_incremental,
        catalog.SQL_SEASONAL_PROFILE_INCREMENTAL,
    ),
    "events_json_props": (
        catalog_generic.q_events_json_props,
        catalog_generic.SQL_EVENTS_JSON_PROPS,
    ),
    "decontam_two_stage": (
        catalog_data.q_decontam_two_stage,
        catalog_data.SQL_DECONTAM_TWO_STAGE,
    ),
    "build_training_shard": (
        catalog_data.q_build_training_shard,
        catalog_data.SQL_BUILD_TRAINING_SHARD,
    ),
    "ivfpq_rerank_recall": (
        catalog_data.q_ivfpq_rerank_recall,
        catalog_data.SQL_IVFPQ_RERANK_RECALL,
    ),
    "source_vocab_overlap": (
        catalog_data.q_source_vocab_overlap,
        catalog_data.SQL_SOURCE_VOCAB_OVERLAP,
    ),
    # --- archiver core (SURVEY.md §2) ---
    "raw_scan": (catalog.q_raw_scan, catalog.SQL_RAW_SCAN),
    "raw_latest_n": (catalog.q_raw_latest_n, catalog.SQL_RAW_LATEST_N),
    "asof_before": (catalog.q_asof_before, catalog.SQL_ASOF_BEFORE),
    "asof_after": (catalog.q_asof_after, catalog.SQL_ASOF_AFTER),
    "asof_pair_align": (catalog.q_asof_pair_align, catalog.SQL_ASOF_PAIR_ALIGN),
    "range_limit_modes": (catalog.q_range_limit_modes, catalog.SQL_RANGE_LIMIT_MODES),
    "decimate_1h": (catalog.q_decimate_1h, catalog.SQL_DECIMATE_1H),
    "decimate_cascade_6h": (
        catalog.q_decimate_cascade_6h,
        catalog.SQL_DECIMATE_CASCADE_6H,
    ),
    "decimate_cascade_1d": (
        catalog.q_decimate_cascade_1d,
        catalog.SQL_DECIMATE_CASCADE_1D,
    ),
    "pick_first_1h": (catalog.q_pick_first_1h, catalog.SQL_PICK_FIRST_1H),
    "decimate_plugin_median_1h": (
        catalog.q_decimate_plugin_median_1h,
        catalog.SQL_DECIMATE_PLUGIN_MEDIAN_1H,
    ),
    "decimate_mixed_1h": (catalog.q_decimate_mixed_1h, catalog.SQL_DECIMATE_MIXED_1H),
    "decimate_typed_1h": (catalog.q_decimate_typed_1h, catalog.SQL_DECIMATE_TYPED_1H),
    "json_v1_mixed_1h": (catalog.q_json_v1_mixed_1h, catalog.SQL_JSON_V1_MIXED_1H),
    "json_v1_typed_1h": (catalog.q_json_v1_typed_1h, catalog.SQL_JSON_V1_TYPED_1H),
    "json_v1_raw_typed": (catalog.q_json_v1_raw_typed, catalog.SQL_JSON_V1_RAW_TYPED),
    "archive_incremental_1h": (
        catalog.q_archive_incremental_1h,
        catalog.SQL_ARCHIVE_INCREMENTAL_1H,
    ),
    "retention_sweep_daily": (
        catalog.q_retention_sweep_daily,
        catalog.SQL_RETENTION_SWEEP_DAILY,
    ),
    "config_xml_roundtrip": (
        catalog.q_config_xml_roundtrip,
        catalog.SQL_CONFIG_XML_ROUNDTRIP,
    ),
    "missing_level_empty": (
        catalog.q_missing_level_empty,
        catalog.SQL_MISSING_LEVEL_EMPTY,
    ),
    "compact_invariance": (
        catalog.q_compact_invariance,
        catalog.SQL_COMPACT_INVARIANCE,
    ),
    "store_level_drop_invariance": (
        catalog.q_store_level_drop_invariance,
        catalog.SQL_STORE_LEVEL_DROP_INVARIANCE,
    ),
    "stream_lifecycle_1h": (
        catalog.q_stream_lifecycle_1h,
        catalog.SQL_STREAM_LIFECYCLE_1H,
    ),
    "csv_ingest_roundtrip_1h": (
        catalog.q_csv_ingest_roundtrip_1h,
        catalog.SQL_CSV_INGEST_ROUNDTRIP_1H,
    ),
    "jsonl_ingest_roundtrip_1h": (
        catalog.q_jsonl_ingest_roundtrip_1h,
        catalog.SQL_JSONL_INGEST_ROUNDTRIP_1H,
    ),
    "union_levels": (catalog.q_union_levels, catalog.SQL_UNION_LEVELS),
    "planner_fallback": (catalog.q_planner_fallback, catalog.SQL_PLANNER_FALLBACK),
    "channel_glob": (catalog.q_channel_glob, catalog.SQL_CHANNEL_GLOB),
    "channel_regex": (catalog.q_channel_regex, catalog.SQL_CHANNEL_REGEX),
    "fuzzy_channel_pairs": (
        catalog.q_fuzzy_channel_pairs,
        catalog.SQL_FUZZY_CHANNEL_PAIRS,
    ),
    "enabling_link": (catalog.q_enabling_link, catalog.SQL_ENABLING_LINK),
    "rate_limit_10m": (catalog.q_rate_limit_10m, catalog.SQL_RATE_LIMIT_10M),
    "heartbeat_1h": (catalog.q_heartbeat_1h, catalog.SQL_HEARTBEAT_1H),
    "heartbeat_connected_1h": (
        catalog.q_heartbeat_connected_1h,
        catalog.SQL_HEARTBEAT_CONNECTED_1H,
    ),
    "heartbeat_stream_connected_1h": (
        catalog.q_heartbeat_stream_connected_1h,
        catalog.SQL_HEARTBEAT_STREAM_CONNECTED_1H,
    ),
    "markers_disconnect": (catalog.q_markers_disconnect, catalog.SQL_MARKERS_DISCONNECT),
    "monotonic_stats": (catalog.q_monotonic_stats, catalog.SQL_MONOTONIC_STATS),
    "channel_dim_join": (catalog.q_channel_dim_join, catalog.SQL_CHANNEL_DIM_JOIN),
    "severity_daily": (catalog.q_severity_daily, catalog.SQL_SEVERITY_DAILY),
    "severity_rollup": (catalog.q_severity_rollup, catalog.SQL_SEVERITY_ROLLUP),
    "channel_gap_stats": (
        catalog.q_channel_gap_stats,
        catalog.SQL_CHANNEL_GAP_STATS,
    ),
    "channel_correlation_matrix": (
        catalog.q_channel_correlation_matrix,
        catalog.SQL_CHANNEL_CORRELATION_MATRIX,
    ),
    # --- generic relational surface ---
    "tpch_q1": (catalog_generic.q_tpch_q1, catalog_generic.SQL_TPCH_Q1),
    "tpch_q3": (catalog_generic.q_tpch_q3, catalog_generic.SQL_TPCH_Q3),
    "tpch_q4": (catalog_generic.q_tpch_q4, catalog_generic.SQL_TPCH_Q4),
    "tpch_q5": (catalog_generic.q_tpch_q5, catalog_generic.SQL_TPCH_Q5),
    "tpch_q6": (catalog_generic.q_tpch_q6, catalog_generic.SQL_TPCH_Q6),
    "tpch_q7": (catalog_generic.q_tpch_q7, catalog_generic.SQL_TPCH_Q7),
    "tpch_q8": (catalog_generic.q_tpch_q8, catalog_generic.SQL_TPCH_Q8),
    "tpch_q10": (catalog_generic.q_tpch_q10, catalog_generic.SQL_TPCH_Q10),
    "tpch_q13": (catalog_generic.q_tpch_q13, catalog_generic.SQL_TPCH_Q13),
    "tpch_q14": (catalog_generic.q_tpch_q14, catalog_generic.SQL_TPCH_Q14),
    "tpch_q15": (catalog_generic.q_tpch_q15, catalog_generic.SQL_TPCH_Q15),
    "tpch_q16": (catalog_generic.q_tpch_q16, catalog_generic.SQL_TPCH_Q16),
    "tpch_q17": (catalog_generic.q_tpch_q17, catalog_generic.SQL_TPCH_Q17),
    "tpch_q19": (catalog_generic.q_tpch_q19, catalog_generic.SQL_TPCH_Q19),
    "tpch_q22": (catalog_generic.q_tpch_q22, catalog_generic.SQL_TPCH_Q22),
    "tpch_q18": (catalog_generic.q_tpch_q18, catalog_generic.SQL_TPCH_Q18),
    "tpch_q2": (catalog_generic.q_tpch_q2, catalog_generic.SQL_TPCH_Q2),
    "tpch_q9": (catalog_generic.q_tpch_q9, catalog_generic.SQL_TPCH_Q9),
    "tpch_q11": (catalog_generic.q_tpch_q11, catalog_generic.SQL_TPCH_Q11),
    "tpch_q12": (catalog_generic.q_tpch_q12, catalog_generic.SQL_TPCH_Q12),
    "tpch_q20": (catalog_generic.q_tpch_q20, catalog_generic.SQL_TPCH_Q20),
    "tpch_q21": (catalog_generic.q_tpch_q21, catalog_generic.SQL_TPCH_Q21),
    "events_pivot": (catalog_generic.q_events_pivot, catalog_generic.SQL_EVENTS_PIVOT),
    "events_unpivot": (
        catalog_generic.q_events_unpivot,
        catalog_generic.SQL_EVENTS_UNPIVOT,
    ),
    "events_dow_profile": (
        catalog_generic.q_events_dow_profile,
        catalog_generic.SQL_EVENTS_DOW_PROFILE,
    ),
    "conversion_funnel": (
        catalog_generic.q_conversion_funnel,
        catalog_generic.SQL_CONVERSION_FUNNEL,
    ),
    "weekly_cohort_retention": (
        catalog_generic.q_weekly_cohort_retention,
        catalog_generic.SQL_WEEKLY_COHORT_RETENTION,
    ),
    "lapsed_customers": (
        catalog_generic.q_lapsed_customers,
        catalog_generic.SQL_LAPSED_CUSTOMERS,
    ),
    "window_running_total": (
        catalog_generic.q_window_running_total,
        catalog_generic.SQL_WINDOW_RUNNING_TOTAL,
    ),
    "sessionize_30m": (
        catalog_generic.q_sessionize_30m,
        catalog_generic.SQL_SESSIONIZE_30M,
    ),
    "events_sliding_1h": (
        catalog_generic.q_events_sliding_1h,
        catalog_generic.SQL_EVENTS_SLIDING_1H,
    ),
    # --- training-data pipeline ---
    "dedup_exact": (catalog_data.q_dedup_exact, catalog_data.SQL_DEDUP_EXACT),
    "dedup_ngram_jaccard": (
        catalog_data.q_dedup_ngram_jaccard,
        catalog_data.SQL_DEDUP_NGRAM_JACCARD,
    ),
    "dedup_minhash_lsh": (
        catalog_data.q_dedup_minhash_lsh,
        catalog_data.SQL_DEDUP_MINHASH_LSH,
    ),
    "dedup_clusters": (catalog_data.q_dedup_clusters, catalog_data.SQL_DEDUP_CLUSTERS),
    "dedup_incremental": (
        catalog_data.q_dedup_incremental,
        catalog_data.SQL_DEDUP_INCREMENTAL,
    ),
    "pair_table_probe_pruned": (
        catalog_data.q_pair_table_probe_pruned,
        catalog_data.SQL_PAIR_TABLE_PROBE_PRUNED,
    ),
    "vocab_topk": (catalog_data.q_vocab_topk, catalog_data.SQL_VOCAB_TOPK),
    "doc_sample_10pct": (
        catalog_data.q_doc_sample_10pct,
        catalog_data.SQL_DOC_SAMPLE_10PCT,
    ),
    "simhash_near_pairs": (
        catalog_data.q_simhash_near_pairs,
        catalog_data.SQL_SIMHASH_NEAR_PAIRS,
    ),
    "text_metrics": (catalog_data.q_text_metrics, catalog_data.SQL_TEXT_METRICS),
    "oov_rate": (catalog_data.q_oov_rate, catalog_data.SQL_OOV_RATE),
    "balanced_sample_per_lang": (
        catalog_data.q_balanced_sample_per_lang,
        catalog_data.SQL_BALANCED_SAMPLE_PER_LANG,
    ),
    "lang_confusion": (
        catalog_data.q_lang_confusion,
        catalog_data.SQL_LANG_CONFUSION,
    ),
    "dedup_rate_by_source": (
        catalog_data.q_dedup_rate_by_source,
        catalog_data.SQL_DEDUP_RATE_BY_SOURCE,
    ),
    "distinctive_terms": (
        catalog_data.q_distinctive_terms,
        catalog_data.SQL_DISTINCTIVE_TERMS,
    ),
    "cluster_quality_report": (
        catalog_data.q_cluster_quality_report,
        catalog_data.SQL_CLUSTER_QUALITY_REPORT,
    ),
    "sequence_packing": (
        catalog_data.q_sequence_packing,
        catalog_data.SQL_SEQUENCE_PACKING,
    ),
    "repetition_metrics": (
        catalog_data.q_repetition_metrics,
        catalog_data.SQL_REPETITION_METRICS,
    ),
    "lang_id": (catalog_data.q_lang_id, catalog_data.SQL_LANG_ID),
    "doc_fingerprint": (
        catalog_data.q_doc_fingerprint,
        catalog_data.SQL_DOC_FINGERPRINT,
    ),
    "ann_cosine_topk": (
        catalog_data.q_ann_cosine_topk,
        catalog_data.SQL_ANN_COSINE_TOPK,
    ),
    "ann_ivf_topk": (catalog_data.q_ann_ivf_topk, catalog_data.SQL_ANN_IVF_TOPK),
    "ann_kmeans_clusters": (
        catalog_data.q_ann_kmeans_clusters,
        catalog_data.SQL_ANN_KMEANS_CLUSTERS,
    ),
    "ann_kmeans_ivf_topk": (
        catalog_data.q_ann_kmeans_ivf_topk,
        catalog_data.SQL_ANN_KMEANS_IVF_TOPK,
    ),
    "cluster_representatives": (
        catalog_data.q_cluster_representatives,
        catalog_data.SQL_CLUSTER_REPRESENTATIVES,
    ),
    "embedding_near_dup": (
        catalog_data.q_embedding_near_dup,
        catalog_data.SQL_EMBEDDING_NEAR_DUP,
    ),
    "embedding_near_dup_lsh": (
        catalog_data.q_embedding_near_dup_lsh,
        catalog_data.SQL_EMBEDDING_NEAR_DUP_LSH,
    ),
    "token_count_bpe": (
        catalog_data.q_token_count_bpe,
        catalog_data.SQL_TOKEN_COUNT_BPE,
    ),
    "embedding_label_stats": (
        catalog_data.q_embedding_label_stats,
        catalog_data.SQL_EMBEDDING_LABEL_STATS,
    ),
    "multimodal_meta": (
        catalog_data.q_multimodal_meta,
        catalog_data.SQL_MULTIMODAL_META,
    ),
    "crossmodal_pairs": (
        catalog_data.q_crossmodal_pairs,
        catalog_data.SQL_CROSSMODAL_PAIRS,
    ),
    "corpus_correlations": (
        catalog_data.q_corpus_correlations,
        catalog_data.SQL_CORPUS_CORRELATIONS,
    ),
    "multimodal_frames": (
        catalog_data.q_multimodal_frames,
        catalog_data.SQL_MULTIMODAL_FRAMES,
    ),
    "contamination_3gram": (
        catalog_data.q_contamination_3gram,
        catalog_data.SQL_CONTAMINATION_3GRAM,
    ),
    "stratified_split": (
        catalog_data.q_stratified_split,
        catalog_data.SQL_STRATIFIED_SPLIT,
    ),
    "quality_quantiles": (
        catalog_data.q_quality_quantiles,
        catalog_data.SQL_QUALITY_QUANTILES,
    ),
    "quality_quantiles_approx": (
        catalog_data.q_quality_quantiles_approx,
        catalog_data.SQL_QUALITY_QUANTILES_APPROX,
    ),
    "mix_corpus_ratios": (
        catalog_data.q_mix_corpus_ratios,
        catalog_data.SQL_MIX_CORPUS_RATIOS,
    ),
    "contamination_exact_run": (
        catalog_data.q_contamination_exact_run,
        catalog_data.SQL_CONTAMINATION_EXACT_RUN,
    ),
    "dedup_best_survivor": (
        catalog_data.q_dedup_best_survivor,
        catalog_data.SQL_DEDUP_BEST_SURVIVOR,
    ),
    "quality_filtered_stats": (
        catalog_data.q_quality_filtered_stats,
        catalog_data.SQL_QUALITY_FILTERED_STATS,
    ),
    "embedding_dedup_clusters": (
        catalog_data.q_embedding_dedup_clusters,
        catalog_data.SQL_EMBEDDING_DEDUP_CLUSTERS,
    ),
    "curate_corpus": (
        catalog_data.q_curate_corpus,
        catalog_data.SQL_CURATE_CORPUS,
    ),
}


#: Driver-attestation ledger: query -> round of its latest CORRECTNESS
#: row, REGENERATED from the CORRECTNESS_r*.json records (tools/
#: regen_ledger.py) — never hand-edited. The driver samples the registry
#: front-to-back with a ~50-query budget, so REGISTRY is ordered
#: never-checked-first, then ascending staleness: round 6's front =
#: the 12 never-checked round-6 additions, then all 44 rows last
#: attested in r02 (VERDICT r5 #2). 56 candidates vs the ~50-query
#: budget: any spillover is the alphabetical tail of the r02 group
#: (cheap tpch rows), which rotates to the front next round.
_LAST_DRIVER_CHECKED = {
    "admin_commands_roundtrip": 8,
    "ann_cosine_topk": 10,
    "ann_ivf_topk": 9,
    "ann_kmeans_clusters": 9,
    "ann_kmeans_ivf_topk": 9,
    "ann_recall_audit": 9,
    "approx_distinct_audit": 8,
    "archive_incremental_1h": 10,
    "array_elementwise_stats": 9,
    "asof_after": 10,
    "asof_before": 10,
    "asof_pair_align": 10,
    "attribution_last_touch": 7,
    "audio_downsample_features": 7,
    "audio_features_wav": 10,
    "audio_fingerprint_near_dup": 10,
    "audio_vad_segments": 7,
    "balanced_sample_per_lang": 9,
    "bloom_decontam_audit": 10,
    "bm25_topk": 8,
    "boilerplate_by_source": 7,
    "boilerplate_spans": 7,
    "bpe_merges": 10,
    "bpe_tokenize_audit": 10,
    "bucket_rollover_estimate": 8,
    "build_training_shard": 10,
    "ca_array_roundtrip_stats": 10,
    "ca_ctrl_metadata": 8,
    "ca_ingest_roundtrip_1h": 10,
    "ca_live_subscribe": 10,
    "ca_live_subscribe_typed": 8,
    "ca_typed_roundtrip_1h": 8,
    "ca_wire_matrix": 7,
    "cdc_chunk_dedup": 9,
    "channel_acf_1h": 9,
    "channel_correlation_matrix": 8,
    "channel_dim_join": 5,
    "channel_gap_stats": 5,
    "channel_glob": 7,
    "channel_health_report": 5,
    "channel_outliers_mad": 9,
    "channel_regex": 7,
    "channel_trend_1h": 9,
    "chunk_dedup_rewrite": 7,
    "cluster_quality_report": 9,
    "cluster_representatives": 8,
    "cluster_split_assign": 8,
    "cms_heavy_hitters": 9,
    "compact_invariance": 7,
    "compact_zorder_invariance": 9,
    "config_xml_roundtrip": 7,
    "containment_pairs": 9,
    "containment_pairs_lsh": 5,
    "containment_recall_audit": 5,
    "contamination_3gram": 9,
    "contamination_exact_run": 8,
    "context_chunks": 9,
    "conversion_funnel": 8,
    "corpus_correlations": 9,
    "counter_rate_6h": 10,
    "crossmodal_pairs": 10,
    "csv_ingest_roundtrip_1h": 8,
    "curate_corpus": 10,
    "curate_round7": 7,
    "curate_round8": 8,
    "curriculum_bins": 10,
    "cusum_changepoints": 10,
    "decimate_1h": 7,
    "decimate_1h_auto_skew": 7,
    "decimate_cascade_1d": 7,
    "decimate_cascade_6h": 7,
    "decimate_mixed_1h": 7,
    "decimate_plugin_median_1h": 8,
    "decimate_typed_1h": 7,
    "decontam_two_stage": 5,
    "dedup_best_survivor": 8,
    "dedup_clusters": 8,
    "dedup_exact": 8,
    "dedup_incremental": 8,
    "dedup_minhash_lsh": 9,
    "dedup_ngram_jaccard": 9,
    "dedup_rate_by_source": 10,
    "dim_truncation_recall": 5,
    "dim_variance_selection_recall": 7,
    "distinctive_terms": 10,
    "distribution_drift": 10,
    "doc_fingerprint": 5,
    "doc_sample_10pct": 9,
    "dsir_importance": 9,
    "embedding_dedup_clusters": 10,
    "embedding_label_stats": 5,
    "embedding_near_dup": 5,
    "embedding_near_dup_lsh": 10,
    "embedding_quantize_audit": 9,
    "enabling_link": 7,
    "enabling_link_multi": 5,
    "epoch_shuffle": 5,
    "events_dow_profile": 9,
    "events_json_props": 5,
    "events_pivot": 9,
    "events_sliding_1h": 9,
    "events_unpivot": 9,
    "ewma_by_channel": 5,
    "fuzzy_channel_pairs": 7,
    "group_split_guard": 10,
    "hard_negative_mining": 7,
    "heartbeat_1h": 7,
    "heartbeat_connected_1h": 10,
    "image_dhash_mixed_codec": 5,
    "image_dhash_near_dup": 10,
    "image_phash_mixed_codec": 7,
    "image_resize_dhash": 7,
    "ivfpq_adc_recall": 5,
    "ivfpq_rerank_recall": 5,
    "json_v1_ca_wire": 8,
    "json_v1_mixed_1h": 7,
    "json_v1_raw_typed": 7,
    "json_v1_typed_1h": 7,
    "jsonl_ingest_roundtrip_1h": 9,
    "lagged_correlation_1h": 10,
    "lang_confusion": 10,
    "lang_id": 5,
    "lapsed_customers": 9,
    "level_backfill_6h": 5,
    "level_freshness_report": 7,
    "lm_backoff_census": 7,
    "lm_quality_score": 7,
    "lsh_recall_audit": 10,
    "markers_disconnect": 7,
    "missing_level_empty": 7,
    "mix_corpus_ratios": 9,
    "mixture_temperature_alloc": 10,
    "monotonic_stats": 7,
    "multimodal_frames": 10,
    "multimodal_meta": 5,
    "ngram_novelty": 10,
    "oov_rate": 10,
    "orc_ingest_roundtrip_1h": 9,
    "pack_efficiency": 10,
    "pagerank_canonical": 7,
    "pair_pagerank": 7,
    "pair_table_incremental": 5,
    "pair_table_streams": 10,
    "pca_top_component": 7,
    "pick_first_1h": 7,
    "pii_redact_rewrite": 8,
    "pii_scan_by_source": 9,
    "planner_fallback": 7,
    "plot_downsample_m4": 10,
    "plot_query_240px": 10,
    "pq_adc_recall": 5,
    "pq_codebook_audit": 5,
    "pq_staleness_audit": 5,
    "purchase_window_rollup": 8,
    "quality_filter_report": 7,
    "quality_filtered_stats": 10,
    "quality_ks_by_source": 10,
    "quality_quantiles": 10,
    "quality_quantiles_approx": 9,
    "range_limit_modes": 7,
    "rate_limit_10m": 7,
    "raw_latest_n": 8,
    "raw_scan": 8,
    "repetition_metrics": 10,
    "resample_linear_1h": 10,
    "retention_fallback_plan": 7,
    "retention_sweep_daily": 8,
    "ridge_probe": 7,
    "sax_motifs": 10,
    "seasonal_hod_anomalies": 5,
    "seasonal_profile_incremental": 5,
    "semantic_dedup": 9,
    "sequence_packing": 10,
    "sessionize_30m": 9,
    "severity_daily": 8,
    "severity_rollup": 8,
    "severity_transitions": 8,
    "shuffle_skew_report": 5,
    "simhash_near_pairs": 9,
    "source_vocab_overlap": 5,
    "split_leakage_audit": 7,
    "store_cdc_diff": 10,
    "store_delete_invariance": 5,
    "store_rename_invariance": 5,
    "store_schema_evolution": 9,
    "store_schema_reverse": 10,
    "store_time_travel": 10,
    "store_typed_roundtrip": 7,
    "stratified_split": 10,
    "stream_dedup_watermark": 8,
    "stream_lifecycle_1h": 8,
    "stream_session_windows": 8,
    "stream_stream_join": 8,
    "stream_stream_join_full": 9,
    "stream_stream_join_outer": 9,
    "stream_watermark_counts": 8,
    "substring_dup_spans": 9,
    "text_metrics": 5,
    "threshold_crossings": 9,
    "token_count_bpe": 5,
    "tpch_q1": 8,
    "tpch_q10": 8,
    "tpch_q11": 9,
    "tpch_q12": 9,
    "tpch_q13": 8,
    "tpch_q14": 8,
    "tpch_q15": 8,
    "tpch_q16": 8,
    "tpch_q17": 8,
    "tpch_q18": 9,
    "tpch_q19": 8,
    "tpch_q2": 9,
    "tpch_q20": 9,
    "tpch_q21": 9,
    "tpch_q22": 8,
    "tpch_q3": 8,
    "tpch_q4": 8,
    "tpch_q5": 8,
    "tpch_q6": 8,
    "tpch_q7": 8,
    "tpch_q8": 8,
    "tpch_q9": 9,
    "ts_gorilla_size": 8,
    "union_levels": 8,
    "value_histogram": 10,
    "video_frame_sample": 5,
    "vocab_topk": 9,
    "weekly_cohort_retention": 9,
    "weighted_sample_per_lang": 5,
    "window_running_total": 9,
    "wsample_bias_audit": 5,
    "zipf_vocab_profile": 5,
}

#: Queries whose LATEST driver record is red (regenerated alongside the
#: ledger): their fixes need driver re-attestation next round, so they
#: outrank even never-checked additions in the rotation order.
_LATEST_DRIVER_RED = frozenset({
})

REGISTRY = {
    name: REGISTRY[name]
    for name in sorted(
        REGISTRY,
        key=lambda n: (n not in _LATEST_DRIVER_RED,
                       _LAST_DRIVER_CHECKED.get(n, 0), n),
    )
}


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
