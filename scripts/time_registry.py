#!/usr/bin/env python
"""Straggler hunt: execute EVERY registered query at a scale factor and
report per-query wall-clock, slowest first.

The oracle harness proves correctness at sf0.01; this proves the whole
registry is *executable* and bounded at the benchmark scale — which the
headline bench alone does not.  The round-5 sweep at sf0.1 caught two
real scale bugs the per-query tests missed: PageRank re-executing its
upstream edge plan every iteration (~27 min for a 2-minute query) and
the triangle wedge-join OOM on the clique-heavy near-dup graph.

Usage: python scripts/time_registry.py [sf_dir] [out.json]
Continues past per-query errors (reported as "ERR ...") and writes the
partial results file after every query, so a crashed JVM loses nothing.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/time_registry.json"

    from datastore_mapper_spark.catalog import load_tables
    from datastore_mapper_spark.registry import all_queries
    from datastore_mapper_spark.session import get_session

    spark = get_session("time-registry")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)["lineitem"].count()  # warm up

    def _isolate() -> None:
        """Drop blocks a finished query left behind (persisted ranged
        frames, localCheckpoint edge lists).  Without this, storage
        pressure from earlier queries pollutes later measurements —
        observed round 6: graph_triangle_count read 611 s inside the
        sweep vs 221 s isolated.  Keeps the catalog's lazy table cache
        (plans only, no blocks)."""
        try:
            for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                rdd.unpersist(False)
        except Exception:
            pass

    out: dict[str, float | str] = {}
    for name, spec in all_queries().items():
        t0 = time.perf_counter()
        try:
            with contextlib.redirect_stdout(io.StringIO()):
                spec.fn(spark, sf_dir).collect()
            out[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # keep hunting past one bad query
            out[name] = f"ERR {type(exc).__name__}: {exc}"[:200]
        _isolate()
        print(name, out[name], flush=True)
        with open(out_path, "w") as f:
            json.dump(out, f)

    timed = sorted(
        ((v, k) for k, v in out.items() if not isinstance(v, str)),
        reverse=True,
    )
    errs = {k: v for k, v in out.items() if isinstance(v, str)}
    print(f"\n== slowest ({sf_dir}) ==")
    for v, k in timed[:15]:
        print(f"{v:9.2f}  {k}")
    print(f"\n{len(timed)} ok, {len(errs)} errors, "
          f"total {sum(v for v, _ in timed):.1f}s -> {out_path}")
    for k, v in errs.items():
        print(f"ERR  {k}: {v}")
    spark.stop()
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
