#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries from BASELINE.md (same SURVEY §2.B rows, same
method: wall-clock around execute+collect, warm JVM) at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query runs ``$SPARK_GRAFT_BENCH_RUNS`` times (default 3) and
reports the MEDIAN, with per-query min/max spread under ``"spread"`` —
single runs drift ~10% run-to-run (r1 vs r2 showed +7.5% on untouched
code), which a median makes attributable.

The 2x bound (BASELINE.json) is against BASELINE.md's PySpark column —
measured on this machine with the same warm-JVM method.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set ≙ BASELINE.md rows (query name -> baseline table row).
HEADLINE = [
    "agg_group_pricing_summary",  # q_pricing_summary
    "join_multiway_revenue",      # q_join5_revenue
    "topk_global",                # q_topk_orders
    "window_rank_topn_per_group", # q_window_rank
    "agg_count_distinct",         # q_distinct_users
    "tumbling_window_1h",         # q_tumbling_1h
    "fn_explode_unnest",          # q_word_count
    "join_semi",                  # q_semi_join
    "join_anti",                  # q_anti_join
    "agg_rollup",                 # q_grouping_sets
    "session_windows_gap30m",     # q_sessionize
    "knn_cosine_top10",           # q_knn_cosine
    "dedup_exact",                # q_dedup
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from datastore_mapper_spark.catalog import load_tables
    from datastore_mapper_spark.registry import all_queries
    from datastore_mapper_spark.session import get_session

    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    # Warm-up: force JVM/codegen/parquet-footer warmup outside the clock.
    load_tables(spark, sf_dir)["lineitem"].count()
    specs["agg_group_pricing_summary"].fn(spark, sf_dir).collect()

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    per_query: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    total = 0.0
    for name in HEADLINE:
        times = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).collect()
            times.append(round(time.perf_counter() - t0, 4))
        med = round(statistics.median(times), 4)
        per_query[name] = med
        spread[name] = [min(times), max(times)]
        total += med

    out = {
        "metric": "headline_total_sec",
        "value": round(total, 4),
        "unit": "sec",
        "queries": per_query,
        "spread": spread,
        "runs": n_runs,
        "sf": sf,
    }
    drift = _drift_vs_previous_round(per_query)
    if drift:
        out["drift_warnings"] = drift
        for w in drift:
            print(f"DRIFT WARNING: {w}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


def _drift_vs_previous_round(per_query: dict[str, float]) -> list[str]:
    """Regression tripwire (round-6 VERDICT task 7): compare this run's
    medians against the LATEST committed BENCH_r{N}.json and warn when a
    query's median exceeds that round's recorded max spread — i.e. the
    new time is outside anything the prior round ever observed, which
    run-to-run noise cannot explain.  Warnings go to stderr AND into the
    JSON (``drift_warnings``) so the artifact self-documents the creep."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    prior = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    if not prior:
        return []
    try:
        with open(prior[-1]) as f:
            prev = json.load(f)
    except (OSError, json.JSONDecodeError):
        return []
    # the driver wraps this script's JSON line under "parsed"
    prev = prev.get("parsed", prev)
    prev_spread = prev.get("spread", {})
    prev_queries = prev.get("queries", {})
    tag = os.path.basename(prior[-1])
    warnings = []
    for name, med in per_query.items():
        hi = max(
            prev_spread.get(name, []) or [prev_queries.get(name, float("inf"))]
        )
        if med > hi:
            # hi == 0.0 (sub-ms timing rounded to zero) must warn, not
            # divide-by-zero-crash the bench run
            ratio = f" ({med / hi:.2f}x)" if hi > 0 else ""
            warnings.append(
                f"{name}: median {med:.3f}s exceeds {tag} max spread "
                f"{hi:.3f}s{ratio}"
            )
    return warnings


if __name__ == "__main__":
    main()
