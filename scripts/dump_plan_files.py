#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries into per-query files
— the optimization round's plan receipts.

Usage:
  python scripts/dump_plan_files.py <sf_dir> <outdir> <suffix> <query> ...

Writes <outdir>/<query>_<suffix>.txt for each query.  The repo root on
sys.path is THIS script's repo (so a worktree checkout of an older
commit dumps that commit's plans).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir, outdir, suffix = sys.argv[1:4]
    names = sys.argv[4:]
    os.makedirs(outdir, exist_ok=True)

    from datastore_mapper_spark.plans.explain import formatted
    from datastore_mapper_spark.registry import all_queries
    from datastore_mapper_spark.session import get_session

    spark = get_session("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(formatted(df))
        print(f"wrote {path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
