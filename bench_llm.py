#!/usr/bin/env python
"""Secondary benchmark: the LLM-pipeline operator layer at
``$SPARK_GRAFT_SF_DIR`` (default sf0.1).  NOT the driver metric
(bench.py carries that contract); this quantifies the exact-vs-sketch
trade-offs SCALE.md cites.  Prints one JSON line with per-op medians
over $SPARK_GRAFT_BENCH_RUNS (default 3) runs."""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OPS = [
    "dedup_exact_digest",        # digest-keyed exact dedup
    "dedup_minhash_lsh",         # LSH candidates (sketch path)
    "dedup_near_jaccard",        # exact near-dup (oracle twin)
    "knn_cosine_top10",          # brute-force ANN baseline
    "ivf_knn_bucketed",          # sign-cell IVF
    "pq_adc_knn",                # product quantization ADC
    "pack_sequences_token_budget",
    "split_train_val_test",
    "rolling_wau_hll_sketch",    # mergeable-sketch rolling distinct
    "data_quality_report",
    "containment_asymmetric_dedup",  # subset detection (array-intersect path)
    "ledger_capped_balance",     # non-associative applyInPandas scan
    "entity_resolution_groups",  # block -> score -> CC merge
    "heavy_hitters_two_phase",   # sample-sketch -> exact verify
    "rrf_fusion_topk",           # hybrid retrieval fusion
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from datastore_mapper_spark.catalog import load_tables
    from datastore_mapper_spark.registry import all_queries
    from datastore_mapper_spark.session import get_session

    spark = get_session("bench-llm")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    load_tables(spark, sf_dir)["documents"].count()  # warm-up

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    per_op: dict[str, float] = {}
    for name in OPS:
        times = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).collect()
            times.append(round(time.perf_counter() - t0, 4))
        per_op[name] = round(statistics.median(times), 4)

    print(
        json.dumps(
            {
                "metric": "llm_ops_total_sec",
                "value": round(sum(per_op.values()), 4),
                "unit": "sec",
                "queries": per_op,
                "runs": n_runs,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
