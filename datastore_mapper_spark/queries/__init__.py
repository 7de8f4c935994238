"""Contract query modules (SURVEY.md §2.B).  Importing this package
registers every query into :mod:`datastore_mapper_spark.registry`."""

from . import scans  # noqa: F401
from . import aggregates  # noqa: F401
from . import joins  # noqa: F401
from . import windows  # noqa: F401
from . import setops  # noqa: F401
from . import functions_suite  # noqa: F401
from . import stream_batch  # noqa: F401
from . import llm_text  # noqa: F401
from . import llm_vector  # noqa: F401
from . import udfs  # noqa: F401
from . import sinks_queries  # noqa: F401
from . import streaming_queries  # noqa: F401
from . import llm_extra  # noqa: F401
from . import mapper_queries  # noqa: F401
from . import functions_extra  # noqa: F401
from . import aggregates_extra  # noqa: F401
from . import windows_extra  # noqa: F401
from . import relational_subqueries  # noqa: F401
from . import tpch_style  # noqa: F401
from . import pipeline_extra  # noqa: F401
from . import udtf_queries  # noqa: F401
from . import scale_queries  # noqa: F401
from . import bpe_queries  # noqa: F401
from . import analytics_advanced  # noqa: F401
from . import analytics_round9  # noqa: F401
from . import acid_queries  # noqa: F401
from . import analytics_round10  # noqa: F401
from . import analytics_round11  # noqa: F401
from . import analytics_round12  # noqa: F401
from . import analytics_round13  # noqa: F401
from . import analytics_round14  # noqa: F401
from . import round15  # noqa: F401
from . import round16  # noqa: F401
from . import round16b  # noqa: F401

from ..registry import reorder_front

# SURVEY §2.B contract order.  The driver grades the FIRST 50 registered
# queries (round-2 VERDICT, "Driver-grading mechanics"), so 50
# oracle-checked rows are pinned to the front.
#
# ROUND-15 ROTATION (round-14 VERDICT task 1): rows 1-30 (the §2.B
# core) stay pinned.  CORRECTNESS_r14 was 50/50 (seventh straight),
# so rows 31-50 rotate.  The 20 slots take the round-14 flagship
# subsystems for first driver contact: the ACID depth wave (named
# BRANCHES with squash publish, MERGE-time schema evolution,
# merge-on-read UPDATE, partition-scoped OPTIMIZE WHERE), the
# exact-substring span-removal dedup rewrite, the FULL OUTER
# stream-stream join and the event-time-timeout stateful
# sessionizer, the Adam7 interlaced-PNG and TIFF/PackBits codec
# rows, the two round-14 promotions (feature-map near-dup, BPE
# encode token accounting), and the round-14 analytics wave heads
# (Spearman footrule, Kendall's W, Jensen-Shannon drift, Ljung-Box,
# Gumbel block-maxima fit, PMI collocations, Kruskal-Wallis,
# Page-Hinkley drift, G-test).  All 20 pass the local oracle gate +
# pandas_probe at sf0.01 before rotating in; the 20 r14-green rows
# rotate behind the window where tests/test_contract_oracle.py +
# scripts/check_contract.py still grade them every run.
_CONTRACT_ORDER = [
    # §2.B rows 1-13: scans + aggregation
    "scan_project", "scan_filter_pushdown", "filter_null_semantics",
    "case_when_bucketing", "agg_global", "agg_group_pricing_summary",
    "agg_having", "agg_count_distinct", "agg_multi_distinct",
    "agg_rollup", "agg_cube", "agg_grouping_sets", "agg_decimal_exact",
    # rows 14-22: joins
    "join_broadcast_dim", "join_shuffle_large", "join_multiway_revenue",
    "join_left_outer", "join_full_outer", "join_semi", "join_anti",
    "join_theta_range", "join_asof_nearest",
    # rows 23-30: windows + ordering
    "window_rank_topn_per_group", "window_row_number_dedup",
    "window_lag_lead_delta", "window_running_sum", "window_moving_avg",
    "window_ntile_first_last", "sort_multi_key_nulls", "topk_global",
    # rows 31-50, rotated IN round 16 (r15 verdict task 3): the
    # round-15 flagship subsystems, swapped forward for first driver
    # contact — the CDF streaming source + IVM streaming hop, type
    # widening, SemDeDup, the mixture/decontamination/chunking
    # sampling wave, tag retention + refs metadata + binpack
    # OPTIMIZE, the r15 stats/text additions — plus the four queue
    # heads of the round-14 analytics second half
    "stream_acid_cdf_source", "stream_acid_ivm_refresh",
    "acid_type_widening", "dedup_semantic_clusters",
    "sample_domain_mixture_budget", "mixture_epochs_upsample",
    "decontaminate_train_eval", "chunk_documents_fixed_stride",
    "acid_tag_retention", "acid_refs_metadata_table",
    "acid_optimize_binpack", "cramer_von_mises_doc_lengths",
    "heaps_law_vocab_growth", "mattr_lexical_diversity",
    "fleiss_kappa_quality_raters", "grubbs_outlier_daily_revenue",
    "cochran_q_urgent_by_year", "hurst_exponent_daily_revenue",
    "jonckheere_terpstra_priority_trend", "yule_k_vocabulary_richness",
    # rotated out in round 16 (all r15-driver-green; local gate covers)
    "acid_branch_publish", "acid_merge_schema_evolution",
    "acid_update_mor", "acid_optimize_where",
    "dedup_remove_duplicate_spans",
    "stream_stream_full_outer_join", "stream_sessionize_stateful",
    "multimodal_png_interlaced_stats", "multimodal_tiff_packbits_stats",
    "multimodal_feature_neardup", "bpe_encode_token_count",
    "footrule_nation_rank_distance", "kendall_w_nation_metrics",
    "jensen_shannon_source_drift", "ljung_box_daily_revenue",
    "gumbel_weekly_max_fit", "pmi_bigram_collocations",
    "kruskal_wallis_priority_value", "page_hinkley_revenue_drift",
    "g_test_segment_priority",
    # rotated out in round 15 (all r14-driver-green; local gate covers)
    "acid_check_constraints", "acid_generated_columns",
    "acid_restore_version", "acid_wap_publish",
    "acid_metadata_tables", "acid_minmax_metadata_pushdown",
    "acid_bloom_index_lookup", "acid_ivm_join_view",
    "stream_acid_to_acid_pipeline",
    "bq_knn_recall_verified", "multimodal_qoi_decode_stats",
    "pca_covariance_eigen",
    "fisher_exact_segment_balance", "corr_matrix_lineitem",
    "calibration_bins_brier", "xcorr_revenue_orders_lagk",
    "sample_weighted_priority", "sample_stratified_proportional",
    "bootstrap_ci_daily_median", "lm_dirichlet_retrieval_topk",
    # rotated out in round 14 (all r13-driver-green; local gate covers)
    "acid_partitioned_scan", "acid_merge_three_way",
    "acid_bucket_pruned_lookup", "stream_acid_source_demo",
    "multimodal_gif_anim_stats", "multimodal_jpeg_progressive_stats",
    "doc_pagerank_centrality",
    "welch_t_test_segments", "mann_whitney_u_doc_lengths",
    "anova_oneway_region_revenue", "bh_fdr_discoveries",
    "acf_lag_k_daily_revenue", "mcnemar_urgency_shift",
    "kaplan_meier_transit",
    "tdigest_quantiles_verified", "markov_event_transitions",
    "shannon_entropy_tokens_by_lang", "zipf_slope_top_terms",
    "hierarchy_share_rollup", "sink_schema_evolution_mergeread",
    # rotated out in round 13 (all r12-driver-green; local gate covers)
    "acid_compact_optimize", "acid_stats_pruned_scan",
    "acid_delete_where_pruned", "acid_deletion_vectors_mor",
    "acid_optimize_zorder_pruned", "acid_change_data_feed",
    "acid_incremental_consumption", "acid_replace_where_backfill",
    "acid_metadata_count_pushdown", "acid_schema_evolution_append",
    "acid_expire_snapshots_vacuum", "stream_acid_exactly_once_sink",
    "multimodal_jpeg_color_stats", "multimodal_adpcm_decode_stats",
    "bloom_semi_join_runtime_filter",
    "dedup_minhash_lsh", "dedup_simhash",
    "spatial_grid_join", "seasonality_dow_hour_index",
    "streak_three_declines",
    # rotated out in round 12 (all r11-driver-green; local gate covers)
    "acid_merge_upsert_roundtrip", "acid_time_travel_read",
    "multimodal_gif_decode_stats", "multimodal_png_decode_stats",
    "multimodal_jpeg_decode_stats", "binary_auc_exact",
    "ewma_dyadic_smoothing", "containment_asymmetric_dedup",
    "chisq_independence_cells", "attribution_linear_multi_touch",
    "fuzzy_join_blocked_levenshtein", "weighted_median_exact",
    "spearman_rank_correlation", "funnel_sessionized",
    "rrf_fusion_topk", "quantile_normalize_by_source",
    "centroid_pairwise_cosine", "dq_benford_first_digit",
    "sample_systematic_every_k", "rfm_segmentation",
    # rotated out in round 11 (all r10-driver-green; local gate covers)
    "set_union_all", "set_union_distinct", "set_intersect", "set_except",
    "fn_string_suite", "fn_math_suite", "fn_conditional", "fn_array_suite",
    "approx_count_distinct",
    "stream_incremental_rollup", "market_basket_lift",
    "skyline_pareto_frontier", "ledger_capped_balance",
    "entity_resolution_groups", "heavy_hitters_two_phase",
    "window_groups_frame_emulated", "percentiles_by_group_exact",
    "distinct_users_bitmap_exact", "approx_topk_misra_gries",
    "multimodal_bmp_resize_stats",
    # rotated out in round 10 (all r9-driver-green; local gate covers)
    "join_interval_overlap", "bm25_retrieval_topk",
    "dedup_keep_best_quality", "ngram_span_dup_coverage",
    "sink_hive_partitioned_pruned_scan", "attribution_first_touch",
    "doc_embedding_join", "multimodal_pipeline_canonical",
    "dedup_incremental_ingest", "funnel_conversion_steps",
    "cohort_retention_weekly", "dq_rule_violations",
    "bpe_pair_counts", "pretraining_corpus_recipe",
    "dq_distribution_drift_psi", "incremental_agg_maintenance",
    "deletion_propagation_cascade", "multimodal_wav_downsample_stats",
    "ivf_knn_bucketed", "knn_batch_top3",
    # rotated out in round 9 (all r8-driver-green; local gate covers)
    "agg_salted_skew_sum",
    "tpch_q9_product_profit", "tpch_q10_returned_items",
    "tpch_q18_large_orders",
    "tpch_q22_global_sales_opportunity",
    "subquery_correlated", "scalar_subquery_uncorrelated",
    "join_lateral_topn", "join_nullsafe_eq", "cte_multi_reference",
    "set_intersect_all", "set_except_all",
    "relational_division_all_years", "cdc_last_write_wins",
    "scd2_validity_intervals", "session_windows_skewsafe",
    "multimodal_bmp_decode_stats", "multimodal_wav_decode_stats",
    "multimodal_y4m_frame_stats", "multimodal_frame_sample_y4m",
    # rotated OUT in round 8 (all r7-driver-green; local gate covers)
    "tpch_q2_min_cost_supplier", "tpch_q3_shipping_priority",
    "tpch_q4_order_priority", "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume", "tpch_q8_market_share",
    "tpch_q11_important_stock", "tpch_q12_shipmode_priority",
    "tpch_q13_customer_distribution", "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier", "tpch_q16_supplier_part_count",
    "tpch_q17_small_quantity",
    "tpch_q19_disjunctive", "tpch_q20_nested_in",
    "tpch_q21_waiting_supplier",
    # rotated out in round 7 (r6-driver-green)
    "dedup_keep_canonical", "dedup_cluster_assign",
    "neardup_jaccard_prefix", "neardup_cosine_bucketed",
    "dedup_exact_digest",
    "median_exact_scalable", "percentiles_exact_scalable",
    "pack_sequences_token_budget", "split_leakfree_by_source",
    "contamination_check", "domain_mix_rebalance",
    "weighted_sample_without_replacement", "tfidf_top_terms",
    "join_bucketed_colocated", "join_salted_skew",
    "sink_entity_writer_roundtrip", "mapper_job_etl", "fn_variant_json",
    "recursive_cte_date_spine",
    # rotated out in round 6 (r5-driver-green)
    "top_terms_per_lang", "udf_python_scalar", "udf_pandas_vectorized",
    "udaf_grouped_pandas", "sink_parquet_roundtrip",
    "stream_tumbling_demo", "stream_dropDuplicates_demo",
    "fn_date_suite", "fn_explode_unnest", "fn_json_extract",
    "agg_collect_sorted",
    "tumbling_window_1h", "sliding_window_counts", "session_windows_gap30m",
    "late_data_watermark_sim",
    "dedup_exact", "dedup_near_jaccard", "knn_cosine_top10",
    "text_stats_by_lang",
]

reorder_front(_CONTRACT_ORDER)
