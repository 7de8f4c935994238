"""Plan-regression tests: the physical plans the engine was designed
around must not silently degrade (SURVEY §4.3).  These are the
scale-readiness checks — a query that stops pushing filters into the
scan or stops broadcasting its dim side still passes the oracle at
sf0.01, but would fall over at 100 TB."""

from __future__ import annotations

import re

from datastore_mapper_spark.plans import formatted, has_operator, scan_info
from datastore_mapper_spark.registry import all_queries

SPECS = all_queries()


def _df(name, spark, sf_dir):
    return SPECS[name].fn(spark, sf_dir)


def test_projection_prunes_scan_columns(spark, sf_dir):
    info = scan_info(_df("scan_project", spark, sf_dir))
    schema = ";".join(info["ReadSchema"])
    assert "l_extendedprice" in schema
    assert "l_shipdate" not in schema  # unused column must not be read


def test_filters_push_to_parquet(spark, sf_dir):
    info = scan_info(_df("scan_filter_pushdown", spark, sf_dir))
    pushed = ";".join(info["PushedFilters"])
    assert "l_shipdate" in pushed and "GreaterThanOrEqual" in pushed
    assert "In(l_returnflag" in pushed


def test_dim_join_broadcasts(spark, sf_dir):
    assert has_operator(_df("join_broadcast_dim", spark, sf_dir), "BroadcastHashJoin")


def test_flagship_join_has_no_cartesian(spark, sf_dir):
    plan = formatted(_df("join_multiway_revenue", spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_topk_avoids_global_sort(spark, sf_dir):
    assert has_operator(_df("topk_global", spark, sf_dir), "TakeOrderedAndProject")


def test_per_group_topn_uses_window_group_limit(spark, sf_dir):
    assert has_operator(
        _df("window_rank_topn_per_group", spark, sf_dir), "WindowGroupLimit"
    )


def test_knn_topk_avoids_global_sort(spark, sf_dir):
    assert has_operator(_df("knn_cosine_top10", spark, sf_dir), "TakeOrderedAndProject")


def test_semi_anti_plan_as_joins(spark, sf_dir):
    assert "LeftSemi" in formatted(_df("join_semi", spark, sf_dir))
    assert "LeftAnti" in formatted(_df("join_anti", spark, sf_dir))


def test_join_anti_plan_pinned(spark, sf_dir):
    """join_anti full plan pin (round-9 VERDICT task 4 — the one
    headline query that drifted above baseline, traced to bench noise:
    warm medians are ~0.07 s and the plan below is already optimal).
    The anti join must stay a BroadcastHashJoin building the FILTERED
    side, with the price filter pushed into the orders scan — a
    shuffle anti join or a build-left flip is a 100 TB regression."""
    plan = formatted(_df("join_anti", spark, sf_dir))
    assert re.search(r"BroadcastHashJoin LeftAnti BuildRight", plan), plan
    assert "SortMergeJoin" not in plan
    info = scan_info(_df("join_anti", spark, sf_dir))
    pushed = ";".join(info["PushedFilters"])
    assert "GreaterThan(o_totalprice" in pushed, pushed


def test_tpch_q3_broadcasts_dims_and_takes_topk(spark, sf_dir):
    plan = formatted(_df("tpch_q3_shipping_priority", spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_tpch_q10_pushes_returnflag_filter(spark, sf_dir):
    info = scan_info(_df("tpch_q10_returned_items", spark, sf_dir))
    assert "l_returnflag" in ";".join(info["PushedFilters"])


def test_tpch_q4_exists_plans_as_semi_join(spark, sf_dir):
    assert "LeftSemi" in formatted(_df("tpch_q4_order_priority", spark, sf_dir))


def test_lateral_topn_plans_as_window_not_rescan(spark, sf_dir):
    plan = formatted(_df("join_lateral_topn", spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_session_window_native_single_shuffle(spark, sf_dir):
    plan = formatted(_df("session_window_native", spark, sf_dir))
    # one exchange for the (session, user) grouping, none extra
    assert plan.count("Exchange") <= 2


def test_tpch_q6_pushes_all_predicates(spark, sf_dir):
    info = scan_info(_df("tpch_q6_forecast_revenue", spark, sf_dir))
    pushed = ";".join(info["PushedFilters"])
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed


def test_tfidf_broadcasts_df_and_limits_window(spark, sf_dir):
    plan = formatted(_df("tfidf_top_terms", spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # document-frequency side broadcasts
    assert "WindowGroupLimit" in plan  # rn <= 3 pushed into the window sort
    assert "CartesianProduct" not in plan  # corpus-size scalar is broadcast-NLJ


def test_width_bucket_partial_agg(spark, sf_dir):
    plan = formatted(_df("fn_width_bucket", spark, sf_dir))
    # partial (map-side) + final HashAggregate around one exchange
    # (formatted plans list each node twice: tree line + detail block)
    assert "partial_count" in plan and "partial_avg" in plan
    assert plan.count("Exchange") <= 2


def test_bigram_jaccard_no_cartesian(spark, sf_dir):
    assert "CartesianProduct" not in formatted(
        _df("dedup_bigram_jaccard", spark, sf_dir)
    )


def test_range_interval_window_pushes_user_filter(spark, sf_dir):
    info = scan_info(_df("window_range_interval", spark, sf_dir))
    assert "user_id" in ";".join(info["PushedFilters"])


def test_knn_batch_broadcasts_queries_and_limits_window(spark, sf_dir):
    plan = formatted(_df("knn_batch_top3", spark, sf_dir))
    # non-equi join against a 10-row query batch must broadcast, not shuffle
    assert "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan


def test_bucketed_join_has_no_join_key_shuffle(spark, sf_dir):
    plan = formatted(_df("join_bucketed_colocated", spark, sf_dir))
    # the whole point of bucketing: no hash-repartition on the join key
    # (the only allowed exchange is the final mktsegment aggregate)
    assert "hashpartitioning(custkey" not in plan


def test_salted_join_no_broadcast_of_fact(spark, sf_dir):
    plan = formatted(_df("join_salted_skew", spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_theta_range_plans_as_equi_join_not_bnlj(spark, sf_dir):
    plan = formatted(_df("join_theta_range", spark, sf_dir))
    # the day-bucket rewrite must plan a hash/sort-merge equi join; the
    # O(n*m) nested loop is exactly what it exists to avoid
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_neardup_cosine_bucketed_is_equi_join(spark, sf_dir):
    plan = formatted(_df("neardup_cosine_bucketed", spark, sf_dir))
    # cell-blocked near-dup must join on the bucket key, never product
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_near_jaccard_candidates_join_on_token(spark, sf_dir):
    plan = formatted(_df("dedup_near_jaccard", spark, sf_dir))
    # candidate generation and the exact verify are all equi-joins
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# Queries ALLOWED to plan BroadcastNestedLoopJoin: each broadcasts a
# side that is tiny BY CONSTRUCTION (a scalar, a <=10-row query batch)
# or is the documented quadratic oracle baseline whose scale path ships
# separately (neardup_cosine_pairs -> neardup_cosine_bucketed).
BNLJ_ALLOWED = {
    "ivf_kmeans_recall_verified",  # 1-row sim-mass scalar crossed onto top-10
    "pq_rerank_verified",          # 1-row rerank-mass scalar crossed onto top-10
    "confusion_matrix_threshold_sweep",  # 5-row literal threshold grid broadcast
    "late_data_watermark_sim",   # 1-row watermark scalar
    "knn_cosine_top10",          # 1 query vector broadcast
    "knn_batch_top3",            # 10-row query batch broadcast
    "neardup_cosine_pairs",      # all-pairs calibration anchor, capped at 500 vecs
    "tfidf_top_terms",           # 1-row corpus-count scalar
    "bm25_retrieval_topk",       # 1-row corpus-length-stats scalar
    "unigram_logprob_score",     # 1-row corpus-total scalar
    "winsorized_price_stats",    # 1-row quantile-bounds scalar
    "median_absolute_deviation", # 1-row median scalar
    "bigram_pmi_top",            # 1-row bigram-total scalar
    "data_quality_report",       # two 1-row summary frames crossed
    "customer_abc_pareto",       # 1-row total-revenue scalar (two-pass cumsum)
    "histogram_equi_depth",      # 1-row total-count scalar (two-pass ntile)
    "window_ntile_first_last",   # 1-row total-count scalar (two-pass ntile)
    "median_exact_scalable",     # 1-row total-count scalar (two-pass median)
    "timeseries_gap_fill_ffill", # |days|-row generated date spine broadcast
    "tpch_q2_min_cost_supplier",   # 1-row supplier-count scalar (partsupp derivation)
    "tpch_q11_important_stock",    # 1-row supplier-count + 1-row total scalars
    "tpch_q16_supplier_part_count",  # 1-row supplier-count scalar (partsupp derivation)
    "percentiles_exact_scalable",  # 1-row total-count scalar (two-pass ranks)
    "funnel_conversion_steps",   # three 1-row stage-count frames crossed
    "dq_rule_violations",        # 1-row violation/denominator frames crossed
    "doc_pagerank_centrality",   # 1-row mass-invariant scalar crossed onto top-20
    "kaplan_meier_transit",      # triangular join on the ~100-row duration dict
    "acf_lag_k_daily_revenue",   # 7-row lag grid broadcast onto the day dict
    "xcorr_revenue_orders_lagk",  # 8-row lag grid broadcast onto the day dict
    "bh_fdr_discoveries",        # 1-row m / kstar scalars crossed onto 25 brands
    "mann_whitney_u_doc_lengths",  # 1-row tie-term scalar crossed onto 1-row sums
    "approx_quantile_error_audit",  # two 1-row (approx, exact) frames crossed
    "dq_distribution_drift_psi",  # 1-row totals frame crossed into 9 bins
    "deletion_propagation_cascade",  # four 1-row blast-radius counts crossed
    "market_basket_lift",        # 1-row order-count scalar crossed into pairs
    "funnel_sessionized",        # three 1-row stage-count frames crossed
    "rrf_fusion_topk",           # 1-row query-vector broadcast (cosine side)
    "quantile_normalize_by_source",  # 1-row pooled-count scalar crossed
    "spatial_grid_join",         # 9-row cell-offset table crossed (3x3 replication)
    "heavy_hitters_two_phase",   # 1-row sampled-doc-count scalar crossed
    "max_concurrent_sessions",   # 1-row peak scalar crossed into the timeline
    "approx_topk_misra_gries",   # 1-row stream-length scalar crossed
    "cms_heavy_hitters_verified",  # 1-row stream-length scalar crossed (x2)
    "decile_lift_table",         # 1-row (n, total-spend) scalar crossed
    "dedup_minhash_lsh",         # 1-row coverage_ok verdict crossed (sketch-verify)
    "dedup_simhash",             # 1-row coverage_ok verdict crossed (sketch-verify)
    "kendall_tau_yearly_nation_revenue",  # two 1-row summary frames crossed
    "theil_sen_daily_revenue_slope",  # 1-row day-count x 1-row median crossed
    "log_odds_monroe_terms",     # 1-row vocab-size scalar crossed
    "poisson_rate_ci_by_type",   # 1-row day-span scalar crossed
    "bloom_semi_join_runtime_filter",  # 1-row bitmap + verdict frames crossed
    "tdigest_quantiles_verified",  # 1-row exact-count scalar crossed onto the digest
    "graph_kcore_membership",    # two 1-row census scalars crossed (promoted r13)
    "sq8_knn_recall_verified",   # 1-row sim-mass scalar crossed onto top-10
    "bq_knn_recall_verified",    # 1-row sim-mass scalar crossed onto top-10
    "mann_kendall_trend_daily",  # triangular join on the ~2400-row day dict
    "hellinger_lang_drift_sources",  # 1-row totals frame crossed into 5 langs
    "cramers_v_priority_status",  # 1-row n scalar crossed into 15 cells
    "durbin_watson_daily_revenue",  # 1-row (n, S) scalar crossed onto day dict
    "runs_test_daily_revenue",   # 1-row median scalar crossed onto day dict
    # round 14
    "footrule_nation_rank_distance",  # 1-row footrule-total scalar crossed onto 25 nations
    "jensen_shannon_source_drift",  # triangular join on the ~20-row source dict (pair grid)
    "ljung_box_daily_revenue",   # 7-row lag grid + 1-row moments scalar (the ACF shape)
    "pmi_bigram_collocations",   # 1-row bigram-total scalar crossed onto the top-50
    "theil_u_event_type_by_segment",  # four 1-row entropy/count scalars crossed
    "kruskal_wallis_priority_value",  # 1-row tie-cubic scalar crossed
    "page_hinkley_revenue_drift",  # 1-row max-rise + alarm-day scalars crossed
    "g_test_segment_priority",   # 1-row N / margin-count scalars crossed
    "cochran_q_urgent_by_year",  # 1-row block/column total scalars crossed
    "hurst_exponent_daily_revenue",  # 4-row size grid + 1-row N scalar crossed
    "jonckheere_terpstra_priority_trend",  # 5-group grids + 1-row meta scalars
    "palma_ratio_customer_revenue",  # 1-row customer-count scalar crossed
    "somers_d_priority_value_quartile",  # 20-cell grid self-join + 1-row N
    "markov_entropy_rate_events",  # 1-row transition-total scalar crossed
    "wilcoxon_signed_rank_yearly_max",  # 1-row tie-cubic scalar crossed
    "friedman_test_yearly_max_ranks",  # 1-row block/rank total scalars crossed
    # round 15
    "dedup_semantic_clusters",   # broadcast-k centroid assignment (k=8 rows)
    "grubbs_outlier_daily_revenue",  # 1-row moment frame crossed onto day dict
    # round 16
    "tukey_hsd_region_revenue",  # 1-row MSW scalar crossed onto the 10 pairs
    "pacf_yule_walker_daily",    # 1-row moment frame crossed onto the lag grid
    "breusch_pagan_daily_trend",  # 1-row OLS-coefficient scalar crossed
    "cooks_distance_daily_trend",  # 1-row OLS-coefficient scalar crossed
    "oov_rate_by_source",        # 1-row train-vocab-size scalar crossed
    "hnsw_knn_recall_verified",  # 1-row sim-mass scalar crossed onto top-10
    "dunn_posthoc_priority_value",   # 1-row N/tie scalars crossed onto 10 pairs
    "anderson_darling_k_sample",  # 1-row totals frame crossed onto value grid
    "jackknife_loo_ratio_by_year",  # 1-row totals crossed onto ~7 year rows
    "dsir_importance_topk",      # 1-row smoothing constants crossed onto docs
    "mmr_diversify_rerank_verified",  # 1-row mmr_ok scalar crossed onto top-10
    "mood_median_test_segments",  # 1-row grand-median scalar crossed onto facts
    "hodges_lehmann_shift_doc_lengths",  # deliberate pairwise-difference
    # join of two ~n/5 slices (the estimator's definition; broadcast side
    # is one lang slice) + 1-row order-stat scalars crossed back
    "hard_negative_mining_top5",  # |n|/50-row anchor batch broadcast
    # (label != label theta-join; production tier = IVF probe set)
    "jl_rerank_verified",  # 1 query vector + 1-row mass scalar crossed
    "ndcg_exact",          # two 1-row (DCG, IDCG) frames crossed
}


def test_no_unexpected_nested_loop_joins(spark, sf_dir):
    """Fleet-wide plan audit: no batch query may plan a CartesianProduct,
    and BroadcastNestedLoopJoin only where the broadcast side is tiny by
    construction (allowlist above).  Guards against a future edit
    silently degrading an equi-join into an O(n*m) product."""
    import contextlib
    import io

    offenders = {}
    for name, spec in SPECS.items():
        if name.startswith(("stream_", "sink_")):
            continue  # executes side effects on build; audited elsewhere
        with contextlib.redirect_stdout(io.StringIO()):
            df = spec.fn(spark, sf_dir)
        plan = formatted(df)
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            offenders[name] = "BroadcastNestedLoopJoin"
    assert not offenders, offenders


def test_join_hints_control_physical_strategy(spark, sf_dir):
    """The three join-strategy hints must each produce their operator —
    the knob a 100 TB tuning session reaches for when AQE's choice is
    wrong (e.g. forcing shuffle-hash when sort keys are expensive, or
    merge when the build side would not fit)."""
    from datastore_mapper_spark.catalog import table

    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cases = {
            "merge": "SortMergeJoin",
            "shuffle_hash": "ShuffledHashJoin",
            "broadcast": "BroadcastHashJoin",
        }
        for hint, operator in cases.items():
            plan = formatted(li.join(o.hint(hint), "o_orderkey"))
            assert operator in plan, f"hint {hint}: {operator} not planned"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_hive_partitioned_scan_prunes_directories(spark, sf_dir):
    """sink_hive_partitioned_pruned_scan's read-back must prune at the
    DIRECTORY level: both partition columns appear in PartitionFilters
    (evaluated against the file listing, before any IO) — at 100 TB
    this is the difference between scanning 6 partition dirs and
    scanning all of them."""
    plan = formatted(_df("sink_hive_partitioned_pruned_scan", spark, sf_dir))
    # A hive-partitioned read has exactly one scan node; anchor on every
    # PartitionFilters section (regex, not str.index — a missing section
    # must fail the assertion, not die with ValueError) and require one
    # that actually carries both partition predicates.
    sections = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert sections, f"no PartitionFilters section in plan:\n{plan}"
    assert any(
        "event_type" in s and "day" in s for s in sections
    ), f"partition predicates missing from PartitionFilters {sections}"


def test_dq_fk_rules_plan_as_anti_joins(spark, sf_dir):
    """The referential rules in dq_rule_violations must be LeftAnti
    joins (broadcast for the dim-sided one), never a NOT-IN rewrite
    through a nested loop."""
    plan = formatted(_df("dq_rule_violations", spark, sf_dir))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_funnel_filters_push_to_scan(spark, sf_dir):
    """Each funnel stage must push its event_type equality into the
    parquet scan — at 100 TB the difference between scanning one event
    type and scanning all of them."""
    info = scan_info(_df("funnel_conversion_steps", spark, sf_dir))
    pushed = ";".join(info["PushedFilters"])
    assert "event_type" in pushed


def test_incremental_ingest_reads_edge_snapshot(spark, sf_dir):
    """dedup_incremental_ingest must consume the materialized pair
    graph (a parquet scan of near_dup_edges_*), not re-derive the
    ~80 s pair join inline."""
    plan = formatted(_df("dedup_incremental_ingest", spark, sf_dir))
    assert "near_dup_edges_" in plan


def test_compaction_reduces_file_count(spark, sf_dir):
    """The compaction contract: after sink_compaction_small_files runs,
    the compacted directory must hold at most 8 data files where the
    fragmented one holds ~64 — a rewrite that silently no-ops (same
    file count) defeats the maintenance job's purpose."""
    import os

    from datastore_mapper_spark.queries.sinks_queries import _scratch_dir

    _df("sink_compaction_small_files", spark, sf_dir).collect()

    def data_files(d):
        return [f for f in os.listdir(d) if f.endswith(".parquet")]

    frag = data_files(_scratch_dir("sink_compact_fragmented", sf_dir))
    comp = data_files(_scratch_dir("sink_compact_done", sf_dir))
    assert len(frag) >= 32, f"fragmented state not fragmented: {len(frag)}"
    assert len(comp) <= 8, f"compaction did not compact: {len(comp)}"


def test_basket_lift_broadcasts_dims_no_cartesian(spark, sf_dir):
    """market_basket_lift: the item-frequency and order-count sides
    are tiny aggregates and must broadcast; the pair self-join joins
    on orderkey (never a cartesian).  The single-row order count may
    appear as a broadcast nested loop (crossJoin of a 1-row agg) —
    what must NOT appear is CartesianProduct."""
    plan = formatted(_df("market_basket_lift", spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_skyline_windows_partition_by_bucket(spark, sf_dir):
    """skyline_pareto_frontier: the window over the customer-grain
    table must be PARTITIONED by the spend bucket — a global
    unpartitioned window over the big side would serialize the whole
    relation through one task at 100 TB.  (The only unpartitioned
    window allowed is over the ~dozens-row bucket-stats table.)  The
    oracle's quadratic NOT-EXISTS must also not leak into the plan as
    a nested-loop join."""
    plan = formatted(_df("skyline_pareto_frontier", spark, sf_dir))
    assert re.search(r"windowspecdefinition\(bucket", plan) or (
        "partitionBy=[bucket]" in plan or "PartitionSpec: [bucket" in plan
        or "[bucket#" in plan
    )
    assert "CartesianProduct" not in plan


def test_ewma_band_join_is_equi_on_user(spark, sf_dir):
    """ewma_dyadic_smoothing: the 20-wide band self-join must plan as
    an equi join on user_id with the band as a post-join filter —
    never a nested-loop over all row pairs."""
    plan = formatted(_df("ewma_dyadic_smoothing", spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_join_blocks_before_levenshtein(spark, sf_dir):
    """fuzzy_join_blocked_levenshtein: candidate generation must be
    the noun-block equi join; levenshtein runs only on block-local
    pairs (a filter above the join), never as a join condition that
    degenerates to a cartesian scan."""
    plan = formatted(_df("fuzzy_join_blocked_levenshtein", spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "levenshtein" in plan


def test_containment_candidates_join_on_shingle(spark, sf_dir):
    """containment_asymmetric_dedup: candidates come from the
    shared-bigram inverted index (equi join on the shingle), and the
    overlap count joins on token equality — no quadratic all-pairs."""
    plan = formatted(_df("containment_asymmetric_dedup", spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_spatial_join_is_cell_equi_join(spark, sf_dir):
    """spatial_grid_join: the oracle's quadratic all-pairs must NOT be
    the plan — candidates come from an equi join on the (cx, cy) cell
    key (the 3x3 replication is a broadcast of the 9-row offset
    table), with the exact distance as a filter above it."""
    plan = formatted(_df("spatial_grid_join", spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_entity_resolution_no_cartesian(spark, sf_dir):
    """entity_resolution_groups: candidates must come from the noun
    block (equi join over distinct names); the CC rounds are
    join+groupBy on node ids — nothing quadratic anywhere."""
    plan = formatted(_df("entity_resolution_groups", spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_dynamic_partition_pruning_in_plan(spark, sf_dir):
    """sink_hive_dynamic_partition_pruning: the partitioned fact scan
    must carry a dynamicpruning expression in its PartitionFilters —
    i.e. Catalyst reuses the broadcast dim to prune partition dirs at
    RUN time.  A plan that reads all 30 day-partitions and filters
    after the scan still passes the oracle but defeats the query's
    purpose at 100 TB."""
    plan = formatted(
        _df("sink_hive_dynamic_partition_pruning", spark, sf_dir)
    )
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_scd2_pit_join_is_equi_not_product(spark, sf_dir):
    """scd2_point_in_time_join: the custkey equi-key must carry the
    join (hash/sort-merge) with the validity interval as a residual —
    a CartesianProduct or BNLJ here means the planner lost the equi
    conjunct and the plan is O(facts x periods)."""
    plan = formatted(_df("scd2_point_in_time_join", spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cms_sketch_builds_with_partial_aggregate(spark, sf_dir):
    """cms_heavy_hitters_verified: the sketch groupBy must show a
    map-side partial aggregate — the bounded-key (depth x width)
    collapse is the whole scale argument of phase 1."""
    plan = formatted(_df("cms_heavy_hitters_verified", spark, sf_dir))
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan


def test_interval_union_reuses_user_partitioning(spark, sf_dir):
    """interval_union_coverage: the running-max window and the final
    per-user aggregate must share the user_id shuffle — one logical
    exchange (formatted plans list nodes twice: tree + detail), never
    a second repartition or a self-join."""
    plan = formatted(_df("interval_union_coverage", spark, sf_dir))
    assert plan.count("Exchange") <= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_twab_single_custkey_shuffle(spark, sf_dir):
    """time_weighted_avg_balance: both windows and the final rollup
    ride ONE custkey exchange."""
    plan = formatted(_df("time_weighted_avg_balance", spark, sf_dir))
    assert plan.count("Exchange") <= 2
    assert "CartesianProduct" not in plan
