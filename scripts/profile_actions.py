#!/usr/bin/env python
"""Per-action profiler for a registered query (optimization round).

Monkeypatches the DataFrame action methods (collect, count, first,
toPandas, localCheckpoint, foreach, write paths are left alone) to log
wall-clock duration plus the engine-code call site, runs the query
once warm, then prints the action log sorted by cost.  This answers
"WHERE inside this 30-second query do the seconds go" — the sweep
medians only say that it is slow.

Usage: python scripts/profile_actions.py <query> [sf_dir] [--runs N]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG: list[tuple[float, str, str]] = []


def _call_site() -> str:
    for frame in reversed(traceback.extract_stack()):
        fn = frame.filename
        if "datastore_mapper_spark" in fn or fn.endswith("_profile_target.py"):
            return f"{os.path.relpath(fn)}:{frame.lineno} {frame.name}"
    return "?"


def _wrap(cls, name):
    orig = getattr(cls, name)

    def wrapped(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig(self, *a, **kw)
        LOG.append((time.perf_counter() - t0, name, _call_site()))
        return out

    wrapped.__name__ = name
    setattr(cls, name, wrapped)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    runs = 1
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=")[1])

    from datastore_mapper_spark.registry import all_queries
    from datastore_mapper_spark.session import get_session

    spark = get_session("profile")
    spark.sparkContext.setLogLevel("ERROR")
    spec = all_queries()[name]
    # Spark 4: pyspark.sql.DataFrame is a facade; instances are the
    # classic (or connect) subclass — wrap the concrete class.
    DataFrame = type(spark.range(1))

    # warm-up (untimed, unlogged)
    spec.fn(spark, sf_dir).collect()
    LOG.clear()

    for action in ("collect", "count", "first", "head", "toPandas",
                   "localCheckpoint", "checkpoint"):
        _wrap(DataFrame, action)

    t0 = time.perf_counter()
    for _ in range(runs):
        rows = spec.fn(spark, sf_dir).collect()
    total = time.perf_counter() - t0
    print(f"\n=== {name}: {total:.2f}s total ({runs} run(s)), "
          f"{len(rows)} rows ===")
    print(f"{'sec':>8}  {'action':<16} call site")
    logged = 0.0
    for dt, act, site in sorted(LOG, key=lambda x: -x[0]):
        logged += dt
        print(f"{dt:8.3f}  {act:<16} {site}")
    print(f"{logged:8.3f}  (sum of logged actions; "
          f"{total - logged:.3f}s outside actions)")
    spark.stop()


if __name__ == "__main__":
    main()
