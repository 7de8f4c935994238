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
# queries (round-2 VERDICT, "Driver-grading mechanics"), so the contract
# rows — all oracle-checked — are pinned to the front in §2.B row order.
# Rows 51-58 of the contract follow immediately (graded locally by
# tests/test_contract_oracle.py + scripts/check_contract.py); extension
# queries keep their import order after that.
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
    # rows 31-34: set ops
    "set_union_all", "set_union_distinct", "set_intersect", "set_except",
    # rows 35-42: function suites
    "fn_string_suite", "fn_date_suite", "fn_math_suite", "fn_conditional",
    "fn_array_suite", "fn_explode_unnest", "fn_json_extract",
    "agg_collect_sorted",
    # rows 43-46: stream-shaped batch
    "tumbling_window_1h", "sliding_window_counts", "session_windows_gap30m",
    "late_data_watermark_sim",
    # rows 47-50: LLM-pipeline core (completes the driver's 50-window)
    "dedup_exact", "dedup_near_jaccard", "knn_cosine_top10",
    "text_stats_by_lang",
    # rows 51-58: contract tail (outside the driver window; local gate)
    "top_terms_per_lang", "udf_python_scalar", "udf_pandas_vectorized",
    "udaf_grouped_pandas", "sink_parquet_roundtrip",
    "approx_count_distinct", "stream_tumbling_demo",
    "stream_dropDuplicates_demo",
]

reorder_front(_CONTRACT_ORDER)
