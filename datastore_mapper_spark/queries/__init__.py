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

from ..registry import reorder_front

# SURVEY §2.B contract order.  The driver grades the FIRST 50 registered
# queries (round-2 VERDICT, "Driver-grading mechanics"), so 50
# oracle-checked rows are pinned to the front.
#
# ROUND-7 ROTATION (round-6 VERDICT items 1-2): rows 1-30 (the §2.B
# core) stay pinned.  Position 31 keeps `agg_salted_skew_sum` — the one
# r6 red (hash-only; bitwise-green locally at 3 SFs) — re-landed with
# the result width pinned DECIMAL(38,2) on both sides like its two
# green siblings, so r7 records the re-grade.  Positions 32-50 rotate
# to the 19 TPC-H flagship shapes (queries/tpch_style.py, the most
# complex query graphs in the registry with zero driver signal so
# far); q22 + the subquery/CTE module head the round-8 rotation.  The
# 19 rows rotated out (r6-driver-green pipeline/scale flagships) move
# behind the window where tests/test_contract_oracle.py +
# scripts/check_contract.py still grade them every run.  Schedule:
# REGISTRY.md §"Driver-grading rotation".
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
    # row 31: r6 red re-landed with pinned decimal width (see its doc)
    "agg_salted_skew_sum",
    # rows 32-50, rotated IN this round: TPC-H flagships q2-q21
    "tpch_q2_min_cost_supplier", "tpch_q3_shipping_priority",
    "tpch_q4_order_priority", "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume", "tpch_q8_market_share",
    "tpch_q9_product_profit", "tpch_q10_returned_items",
    "tpch_q11_important_stock", "tpch_q12_shipmode_priority",
    "tpch_q13_customer_distribution", "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier", "tpch_q16_supplier_part_count",
    "tpch_q17_small_quantity", "tpch_q18_large_orders",
    "tpch_q19_disjunctive", "tpch_q20_nested_in",
    "tpch_q21_waiting_supplier",
    # rotated OUT this round (all r6-driver-green; local gate covers)
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
    "approx_count_distinct", "stream_tumbling_demo",
    "stream_dropDuplicates_demo",
    "fn_date_suite", "fn_explode_unnest", "fn_json_extract",
    "agg_collect_sorted",
    "tumbling_window_1h", "sliding_window_counts", "session_windows_gap30m",
    "late_data_watermark_sim",
    "dedup_exact", "dedup_near_jaccard", "knn_cosine_top10",
    "text_stats_by_lang",
    # rotated out in round 5 (r1-r3 driver-green)
    "set_union_all", "set_union_distinct", "set_intersect", "set_except",
    "fn_string_suite", "fn_math_suite", "fn_conditional", "fn_array_suite",
]

reorder_front(_CONTRACT_ORDER)
