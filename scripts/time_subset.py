#!/usr/bin/env python
"""Time a SUBSET of registered queries with the sweep's methodology
(N timed runs of execute+collect, median + spread, warm session) —
for before/after receipts during optimization rounds without paying
for the full 509-query sweep.

Usage: python scripts/time_subset.py <sf_dir> <query> [query ...]
Env: SPARK_GRAFT_SWEEP_RUNS (default 2).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    runs = int(os.environ.get("SPARK_GRAFT_SWEEP_RUNS", "2"))

    from datastore_mapper_spark.registry import all_queries
    from datastore_mapper_spark.session import get_session

    specs = all_queries()
    spark = get_session("time-subset")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in names:
        spec = specs[name]
        spark.sparkContext.setJobDescription(f"time_subset:{name}")
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).collect()
            ts.append(round(time.perf_counter() - t0, 3))
        out[name] = round(statistics.median(ts), 3)
        spread[name] = [min(ts), max(ts)]
        print(f"{out[name]:8.3f}  {name}  {spread[name]}", flush=True)
    print(json.dumps({"queries": out, "spread": spread,
                      "runs": runs, "sf_dir": sf_dir}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
