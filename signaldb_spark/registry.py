"""Central registry merging every query battery for the driver contract."""

from __future__ import annotations

from . import (
    bench_logql,
    bench_promql,
    bench_queries,
    bench_relational,
    bench_round6,
    bench_round7,
    bench_round8,
    bench_round9,
    bench_round10,
    bench_round11,
    bench_round12,
    bench_round13,
    bench_round14,
    bench_round15,
    bench_round16,
    bench_round17,
    bench_round18,
    bench_sessions,
    bench_trace_ir,
    bench_trainingdata,
)

_MODULES = [
    bench_queries,
    bench_relational,
    bench_trainingdata,
    bench_logql,
    bench_promql,
    bench_trace_ir,
    bench_sessions,
    # staging batteries LAST (round7 after round6): their never-verified
    # names sort after every earlier module's, keeping the driver's
    # 50-prefix pinned to the backlog each round was tuned to prove
    bench_round6,
    bench_round7,
    bench_round8,
    bench_round9,
    bench_round10,
    bench_round11,
    bench_round12,
    bench_round13,
    bench_round14,
    bench_round15,
    bench_round16,
    bench_round17,
    bench_round18,
]

# Queries already hash-verified by the driver's correctness gate in rounds
# 1-5 (CORRECTNESS_r01..r05.json). The gate samples a prefix of the dict,
# so never-sampled queries are ordered FIRST to maximize cumulative driver
# evidence across rounds; these go last.
_DRIVER_VERIFIED = frozenset({
    # rounds 1-2
    "absent", "bottomk_per_bucket", "bytes_over_time", "calendar",
    "count_over_time", "count_values", "dedup_clusters", "dedup_exact",
    "dedup_jaccard", "dedup_minhash_lsh", "dedup_simhash", "deriv",
    "detected_fields", "distinct_discovery", "emb_cosine_topk",
    "emb_ivf_ann", "emb_lsh_ann", "first_last_over_time", "increase",
    "intersect_except", "ir_kleene", "irate", "label_replace",
    "line_filters", "logical_and", "logical_unless", "map_attr_ordered",
    "multimodal_features", "ne_matches_absent", "outer_agg",
    "point_lookup", "pricing_summary", "quantile_over_time", "rate",
    "region_revenue", "resets_changes", "scalar_value_ops",
    "semi_anti_join", "shipping_priority", "sliding_subquery",
    "sql_surface", "stddev_stdvar", "text_fingerprint", "text_lang_id",
    "text_quality", "text_tokens", "time_window_sorted", "topk_per_bucket",
    "union_by_name", "unwrap_aggs", "vector_compare", "vector_ratio",
    # round 3 (47 green rows in CORRECTNESS_r03.json)
    "returned_item_revenue", "large_orders", "salted_agg",
    "volume_shipping", "promo_revenue", "brand_quantity_revenue",
    "multimodal_frame_sample", "multimodal_resize", "emb_near_dup",
    "text_repetition", "tfidf_top_terms", "decontaminate",
    "stratified_sample", "pii_redact", "segment_dedup", "emb_kmeans",
    "emb_mean_pool", "dataset_split", "pack_sequences", "dedup_incremental",
    "emb_quantize", "text_familiarity", "emb_knn_classify", "dedup_verify",
    "source_cap", "semantic_decontaminate", "url_dedup", "repeated_ngrams",
    "emb_pq", "emb_pq_adc", "corpus_report", "emb_ivf_pq",
    "logql_count_by_service", "logql_label_format", "logql_error_ratio",
    "logql_json_quantile", "logql_line_filter_topk", "logql_attr_unless",
    "logql_labels", "logql_label_values", "logql_series", "logql_volume",
    "logql_patterns", "logql_regexp_stage", "logql_pattern_stage",
    "logql_vector_fill", "logql_approx_topk",
    # round 4 (50 green rows in CORRECTNESS_r04.json)
    "priority_shipmode", "curation_pipeline", "curation_full",
    "flamegraph_rollup", "flamegraph_diff", "profile_self_time",
    "trace_metrics_compare", "flamegraph_truncate",
    "logql_pattern_filter", "logql_error_label", "logql_rate_counter",
    "logql_unwrap_duration", "logql_offset", "promql_last",
    "promql_sum_rate", "promql_topk_avg", "promql_clamp_compare",
    "promql_attr_matcher", "promql_histogram_quantile",
    "promql_histogram_fraction", "promql_predict_linear",
    "promql_holt_winters", "promql_histogram_count_sum", "promql_labels",
    "promql_label_values", "promql_series", "metrics_rollup_avg",
    "promql_mad", "exphist_quantile", "summary_quantile", "label_stats",
    "recording_rule_eval", "exphist_quantile_signed", "histogram_le_series",
    "slo_burn_rate", "query_exemplars", "promql_hq_exemplars",
    "promql_offset", "promql_at_pin", "promql_timestamp",
    "promql_time_vector", "metrics_rollup_cascade", "promql_trig",
    "promql_mod_pi", "promql_ts_of", "promql_first_over_time",
    "promql_limitk", "promql_limit_ratio", "promql_hist_stddev",
    "promql_hist_avg",
    # round 5 (50 green rows in CORRECTNESS_r05.json)
    "alert_for", "asof_forward", "asof_join", "asof_join_sliced",
    "asof_nearest", "dedup_containment", "emb_mips_topk", "event_funnel",
    "event_rolling_window", "event_sessions", "exphist_rate_quantile",
    "interval_join", "ir_agg_pipeline", "ir_correlate", "ir_extract_rank",
    "ir_match", "logql_ip_filter", "profile_label_values", "profile_types",
    "promql_alert_state", "promql_metadata", "promql_native_quantile",
    "promql_tsdb_status", "red_metrics", "service_graph",
    "span_event_filter", "text_entropy", "time_weighted_avg",
    "trace_child_spans", "trace_critical_path", "trace_descendant_closure",
    "trace_descendant_spans", "trace_duration_filter", "trace_linked",
    "trace_metrics_histogram", "trace_metrics_p90", "trace_metrics_rate",
    "trace_not_child", "trace_search_regex", "trace_search_select",
    "trace_search_truncation", "trace_sibling_spans", "trace_spanset_agg",
    "trace_tag_names", "trace_tag_names_v2", "trace_tag_values",
    "trace_tail_sample", "unigram_logprob", "user_retention",
    "zscore_anomaly",
    # round 6 (50 green rows in CORRECTNESS_r06.json)
    "anomaly_mad_events", "apdex_score", "array_ops_battery",
    "behavior_cohorts", "concurrent_sessions", "corr_quantity_price",
    "cube_priority_status", "cumulative_unique_users",
    "customer_order_distribution", "dense_rank_spenders",
    "dup_rate_by_source", "embedding_norm_stats", "fano_factor",
    "forecast_revenue", "funnel_conversion_time", "fuzzy_prefix_pairs",
    "idle_customer_balance", "json_extract_battery",
    "last_touch_attribution", "logql_bytes_rate", "logql_volume_range",
    "market_share", "markov_transitions", "mode_value_per_group",
    "ntile_customer_quartiles", "orders_above_segment_avg",
    "pareto_revenue", "percentile_bands", "pivot_status_count",
    "price_band_cheapest", "priority_exists_check", "product_profit",
    "promql_quantile_by", "region_nation_list", "rollup_revenue",
    "service_gap_analysis", "session_duration_stats", "session_funnel",
    "sli_error_budget", "slo_multiwindow_burn", "small_quantity_revenue",
    "suppliers_sole_blame", "time_in_state", "top_supplier",
    "user_activity_percentiles", "value_histogram", "weekday_seasonality",
    "weighted_median_price", "yoy_revenue", "zipf_slope",
    # round 7 (50 green rows in CORRECTNESS_r07.json)
    "alert_debounce", "audience_overlap", "autocorr_daily_volume",
    "benford_deviation", "char_trigram_signature",
    "chi_square_independence", "cross_lingual_contamination",
    "cusum_changepoint", "daily_reconciliation", "decile_lift",
    "embedding_outliers", "except_all_multiset", "excess_inventory",
    "gapfill_daily_counts", "gini_coefficient", "graph_2hop_reach",
    "grouping_sets_explicit", "hhi_concentration", "hopping_window_counts",
    "important_stock", "jackknife_lang_quality", "keyset_pagination",
    "ks_drift_statistic", "latency_heatmap", "min_cost_supplier",
    "neyman_allocation", "ngram_novelty_rate", "ohlc_candles",
    "open_order_aging", "padding_waste_analysis", "pareto_tail_alpha",
    "partition_fingerprint", "parts_supplier_census", "posting_lists",
    "psi_length_drift", "rfm_segments", "ring_negative_pairs",
    "seq_bigram_pmi", "session_path_trigrams", "source_overlap_matrix",
    "survival_curve", "token_budget_mix", "top_product_pairs",
    "topk_with_ties", "trimmed_mean_price", "unigram_kl_by_source",
    "unpivot_daily_mix", "vocab_growth_curve", "wilson_error_rank",
    "wow_service_volume",
    # round 8 (50 green rows in CORRECTNESS_r08.json)
    "dedup_cc_distributed", "ratelimit_admission",
    "ratelimit_bytes_admission", "hot_cold_visibility",
    "logql_backward_topk", "filtered_tail_topk", "customer_ltv_cohort",
    "percent_of_total_window", "robust_scaler_stats",
    "dup_cluster_size_histogram", "rolling_distinct_users",
    "emb_centroid_shift", "longest_activity_streak", "top_k_movers",
    "abandonment_by_hour", "user_entropy_bands", "peak_to_median_load",
    "locf_gap_fill", "returns_share_matrix", "holiday_diff_in_diff",
    "ab_test_two_proportion", "lead_lag_correlation",
    "weekly_revenue_waterfall", "percent_rank_bands", "linear_attribution",
    "key_skew_profile", "freshness_report", "minhash_error_bands",
    "ann_recall_at_k", "bm25_topk", "new_vs_returning_mix",
    "power_user_curve", "cr4_concentration",
    "seasonal_trend_decomposition", "ship_lag_distribution",
    "tfidf_cosine_pairs", "centroid_confusion_matrix",
    "emb_dim_variance_scree", "load_average_rates", "median_order_gap",
    "error_burst_streaks", "priority_mix_shift",
    "realized_vs_retail_margin", "event_interarrival_histogram",
    "doc_word_stats", "discount_elasticity", "text_hapax_ratio",
    "bipartite_degree_distribution", "revenue_drawdown",
    "transition_entropy",
    # round 9 (49 green rows in CORRECTNESS_r09.json; manifest_stats_report
    # was the one red — intentionally NOT listed so it leads the r10 prefix
    # and re-proves the INT96 stats fix under the driver's oracle)
    "ir_metrics_rate_cumulative", "ir_metrics_histogram_quantile",
    "ir_metrics_gauge_last", "ir_metrics_exphist_quantile",
    "typed_attr_int_predicate", "discovery_value_suggestions",
    "streaming_resume_drain", "ir_metrics_summary_quantile",
    "ir_metrics_vector_binop", "ir_metrics_binop_group_left",
    "typed_attr_trace_predicate", "unit_price_dispersion",
    "nation_rank_shift", "order_size_histogram", "session_bounce_rate",
    "spearman_daily_corr", "mann_whitney_u", "welch_t_test",
    "ngram_coverage_curve", "dwell_time_stats", "session_position_dropoff",
    "session_type_lift", "emb_centroid_silhouette", "trailing_30d_revenue",
    "month_arithmetic_battery", "snapshot_time_travel",
    "manifest_time_prune", "compaction_equivalence",
    "retention_drop_equivalence", "quantile_disc_battery",
    "string_ops_battery", "bitwise_battery", "argmax_battery",
    "lsh_band_tuning_curve", "brand_repeat_rate", "nation_trade_balance",
    "value_qq_deciles", "hot_gc_safety", "snapshot_expiry_read_stability",
    "idempotent_replay_visibility", "recency_weighted_activity",
    "customer_trend_mix", "skewness_report", "anova_f_component",
    "skyline_orders", "tenant_isolation_scan", "hot_only_first_run",
    "theil_sen_daily_trend", "runs_test_randomness",
    # round 10 (50 green rows in CORRECTNESS_r10.json — including
    # manifest_stats_report, round 9's one red, re-proved after the
    # INT96 stats fix)
    "manifest_stats_report", "quota_enforcement", "selfmon_query_spans",
    "api_key_quota_lifecycle", "streaming_ingest_visibility",
    "typed_attr_metric_predicate", "int96_session_stats_selfcheck",
    "tz_repin_epoch_consistency", "api_prom_range_envelope",
    "api_loki_streams_envelope", "api_tempo_search_envelope",
    "logql_distinct_stage", "logql_drop_label_stage", "bpe_merge_table",
    "bpe_compression_by_source", "shared_passage_extraction",
    "epoch_shuffle_batches", "chi2_keyness_terms", "llr_collocations",
    "mean_battery", "null_semantics_battery", "intdiv_mod_battery",
    "compaction_stats_pruning", "retention_tail_topk",
    "partition_filter_scan", "simpson_diversity",
    "sla_attainment_by_priority", "revenue_milestone_days",
    "emb_dim_correlation_top", "price_size_monotonicity",
    "weekday_profile_distance", "moving_median_revenue",
    "ewma_14d_revenue", "price_volume_decomposition",
    "null_key_join_battery", "grouping_sets_distinct_users",
    "abc_xyz_matrix", "net_revenue_retention", "type_hierarchy_rollup",
    "cdc_keep_latest", "session_definition_sensitivity",
    "topk_stability_quarters", "median_ci_rank_bounds",
    "dead_letter_split", "activation_velocity", "dual_sourcing_share",
    "term_burstiness", "sq8_reconstruction_snr", "iso_week_boundary",
    "expiry_retains_window",
    # round 11 (50 green rows in CORRECTNESS_r11.json — the full round-10
    # priority tier: every remaining façade envelope gate, the ops-compact
    # trio, the LogQL metric-path output stages, the chunking pair, plus
    # the head of the staged analytics queue)
    "api_prom_instant_envelope", "api_loki_matrix_envelope",
    "api_loki_discovery_envelope", "api_sql_envelope",
    "logql_keep_stage_metric", "logql_unpack_metric_path",
    "doc_chunk_windows", "chunk_overlap_audit", "api_ops_compact_dryrun",
    "api_ops_compact_status", "api_ops_compact_rewrite",
    "api_loki_tail_envelope", "api_pyroscope_render_envelope",
    "api_pyroscope_render_diff_envelope", "api_pyroscope_discovery_envelope",
    "api_pyroscope_trace_profiles", "api_tempo_trace_envelope",
    "api_tempo_metrics_envelope", "api_tempo_metrics_instant",
    "api_prom_discovery_envelope", "api_prom_tsdb_status_envelope",
    "api_prom_label_stats_envelope", "api_prom_metadata_envelope",
    "api_loki_volume_envelope", "api_loki_volume_range_envelope",
    "api_loki_patterns_envelope", "api_loki_detected_fields_envelope",
    "chi2_gof_quantity", "journeys_per_user", "not_in_null_trap",
    "rows_vs_range_peers", "type_cosine_affinity", "dau_mau_stickiness",
    "scd2_validity_intervals", "compaction_time_travel", "knn_reciprocity",
    "null_safe_equality_battery", "multi_distinct_agg",
    "balance_revenue_quadrants", "hot_cold_time_filter",
    "iqr_price_outliers", "tax_discount_grid", "geo_harmonic_means",
    "priority_entropy_by_segment", "lang_length_zscore",
    "emb_clip_fractions", "winsorized_mean_value", "month_end_load",
    "acctbal_decile_profile", "part_token_revenue",
    # round 12 (50 green rows in CORRECTNESS_r12.json — the full round-11
    # priority tier: the point-lookup pruning substrate, the metric-native
    # IR sub-model tail, the manifest lifecycle pair, the LogQL byte-stage
    # pair, the PromQL agg tail, the embedding report battery, plus the
    # head of the staged analytics queue)
    "trace_point_lookup_bucketed", "trace_bucket_census",
    "point_lookup_time_sliced", "point_lookup_absent_key",
    "api_tempo_trace_pruned", "logql_tie_cut_determinism",
    "zorder_two_dim_scan", "zorder_rewrite_census",
    "point_lookup_after_compaction", "ir_metrics_rate_delta",
    "ir_metrics_instant_nostep", "ir_metrics_sum_over_time",
    "ir_metrics_avg_over_time", "ir_metrics_min_over_time",
    "ir_metrics_max_over_time", "ir_metrics_last_over_time",
    "ir_metrics_series_count", "ir_metrics_sum_instant",
    "ir_metrics_gauge_delta", "ir_extract_logfmt_gate",
    "ir_rank_topk_gate", "manifest_lineage_census", "manifest_props_carry",
    "logql_decolorize_bytes", "logql_line_format_bytes",
    "promql_stdvar_agg", "promql_bottomk_min", "promql_sum_without",
    "emb_norm_percentile_bands", "emb_label_centroid_distances",
    "emb_coordinate_range_report", "emb_label_purity_knn1",
    "emb_top_norm_label_mix", "emb_quadrant_occupancy",
    "emb_dim_mean_shift_halves", "emb_norm_by_vecid_decile",
    "emb_centroid_global_cosine", "emb_dim_extreme_census",
    "emb_first_dim_histogram", "emb_ring_dot_extremes",
    "emb_dim_separability", "emb_anchor_cosine_profile",
    "emb_dim_range_profile", "hll_error_bound", "range_interval_window",
    "weekend_premium_by_segment", "first_priority_repeat",
    "least_greatest_battery", "mad_retail_price", "order_value_cv",
})

# Engine-contract gates that prove the highest-value components under the
# driver's DuckDB oracle. The r7 tier (CC loop, rate limiter, hot/cold,
# TopK tail scan) all went green in CORRECTNESS_r08.json; this round's tier
# pulls the round-8 flagship components — the metric-native IR sub-model,
# the typed-attribute substrate, the unified discovery surface, and the
# streaming resume-drain contract — from their round-12/13/14 staging
# blocks to the very front of the never-verified prefix so they get
# driver-oracle evidence now instead of 3-5 rounds out.
_PRIORITY = (
    # round-12 build (bench_round18): the point-lookup pruning substrate
    # (bloom sidecars + md5 buckets) and the deterministic limit cut —
    # the newest code is the highest-risk and leads the driver sample
    # (locally driven fresh-process at sf0.001 + sf0.01 before commit)
    "trace_point_lookup_bucketed",
    "trace_bucket_census",
    "point_lookup_time_sliced",
    "point_lookup_absent_key",
    "api_tempo_trace_pruned",
    "logql_tie_cut_determinism",
    "zorder_two_dim_scan",
    "zorder_rewrite_census",
    "point_lookup_after_compaction",
    # round-12 tier: the 34 engine-surface gates still without driver
    # evidence — the metric-native IR sub-model tail (the reference's own
    # roadmap surface), the IR logfmt-extract and rank gates, the manifest
    # lifecycle pair, the LogQL byte-stage pair, the PromQL agg tail, and
    # the embedding report battery. Everything else in the never-sampled
    # queue is TPC-H-shaped staged analytics, lower risk.
    "ir_metrics_rate_delta",
    "ir_metrics_instant_nostep",
    "ir_metrics_sum_over_time",
    "ir_metrics_avg_over_time",
    "ir_metrics_min_over_time",
    "ir_metrics_max_over_time",
    "ir_metrics_last_over_time",
    "ir_metrics_series_count",
    "ir_metrics_sum_instant",
    "ir_metrics_gauge_delta",
    "ir_extract_logfmt_gate",
    "ir_rank_topk_gate",
    "manifest_lineage_census",
    "manifest_props_carry",
    "logql_decolorize_bytes",
    "logql_line_format_bytes",
    "promql_stdvar_agg",
    "promql_bottomk_min",
    "promql_sum_without",
    "emb_norm_percentile_bands",
    "emb_label_centroid_distances",
    "emb_coordinate_range_report",
    "emb_label_purity_knn1",
    "emb_top_norm_label_mix",
    "emb_quadrant_occupancy",
    "emb_dim_mean_shift_halves",
    "emb_norm_by_vecid_decile",
    "emb_centroid_global_cosine",
    "emb_dim_extreme_census",
    "emb_first_dim_histogram",
    "emb_ring_dot_extremes",
    "emb_dim_separability",
    "emb_anchor_cosine_profile",
    "emb_dim_range_profile",
)


def _reorder(d):
    out = {k: d[k] for k in _PRIORITY
           if k in d and k not in _DRIVER_VERIFIED}
    out.update({k: v for k, v in d.items()
                if k not in _DRIVER_VERIFIED and k not in out})
    out.update({k: v for k, v in d.items() if k in _DRIVER_VERIFIED})
    return out


def all_queries():
    out = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return _reorder(out)


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return _reorder(out)
