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
# queries (round-2 VERDICT, "Driver-grading mechanics"), so 50 contract
# rows — all oracle-checked — are pinned to the front.
#
# ROUND-5 ROTATION (round-4 VERDICT item 6, open since round 2): the 8
# contract rows that had never received a driver-graded entry
# (udf_*, udaf_*, top_terms_per_lang, sinks, the two streaming demos)
# are rotated INTO the graded window this round.  To make room, 8 rows
# with multiple prior green driver entries (r1-r3: the four set ops and
# four function suites) rotate out to positions 51-58, where the local
# gate (tests/test_contract_oracle.py + scripts/check_contract.py)
# still covers them.  Net: after this round every §2.B row has at least
# one driver-recorded CORRECTNESS entry.
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
    # rotated IN (were contract rows 51-58; never driver-graded before)
    "top_terms_per_lang", "udf_python_scalar", "udf_pandas_vectorized",
    "udaf_grouped_pandas", "sink_parquet_roundtrip",
    "approx_count_distinct", "stream_tumbling_demo",
    "stream_dropDuplicates_demo",
    # rows 35-36, 40-42 of the original order: function suites kept in
    "fn_date_suite", "fn_explode_unnest", "fn_json_extract",
    "agg_collect_sorted",
    # rows 43-46: stream-shaped batch
    "tumbling_window_1h", "sliding_window_counts", "session_windows_gap30m",
    "late_data_watermark_sim",
    # rows 47-50: LLM-pipeline core (completes the driver's 50-window)
    "dedup_exact", "dedup_near_jaccard", "knn_cosine_top10",
    "text_stats_by_lang",
    # rotated OUT this round (green in r1-r3 driver records; local gate)
    "set_union_all", "set_union_distinct", "set_intersect", "set_except",
    "fn_string_suite", "fn_math_suite", "fn_conditional", "fn_array_suite",
]

reorder_front(_CONTRACT_ORDER)
