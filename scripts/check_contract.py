#!/usr/bin/env python
"""Local differential oracle harness — mirrors the driver's check.

For every registered query: run the Spark callable and the DuckDB
oracle SQL over the same parquet dir, then compare row count, sorted
column names, and the order-insensitive multiset of canonicalized
values.  Exact comparison (floats bitwise) — stricter than any hash.

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import sys

sys.path.insert(0, "/root/repo")


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, datetime.datetime):
        return f"t:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"D:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return f"x:{v.hex()}"
    return f"s:{v}"


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from datastore_mapper_spark.registry import all_queries
    from datastore_mapper_spark.session import get_session

    specs = all_queries()
    if only:
        specs = {k: v for k, v in specs.items() if k in only}

    spark = get_session("contract-check")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_rows_only = 0
    for name, spec in sorted(specs.items()):
        try:
            sdf = spec.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (rows-only)")
            n_rows_only += 1
            continue
        try:
            cur = con.execute(spec.oracle)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(ocols)}")
        if not problems:
            sc = canon_rows(scols, [tuple(r) for r in srows])
            oc = canon_rows(ocols, orows)
            if sc != oc:
                diffs = [(a, b) for a, b in zip(sc, oc) if a != b]
                problems.append(
                    f"values differ ({len(diffs)}/{len(sc)} rows); first: "
                    f"spark={diffs[0][0][:160]!r} duckdb={diffs[0][1][:160]!r}"
                    if diffs else "values differ (row multiset mismatch)"
                )
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
          f"({len(specs)} total) @ {sf_dir}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
