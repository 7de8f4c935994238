"""Differential-oracle comparison utilities (SURVEY §5.2-1).

Mirrors the driver's correctness gate: row count + sorted column names
+ order-insensitive multiset of canonicalized values, with *bitwise*
float comparison (stricter than any hash the driver could use).
Shared by scripts/check_contract.py and the pytest suite.
"""

from __future__ import annotations

import datetime
import decimal
import math
from dataclasses import dataclass

ORACLE_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        return "f:nan" if math.isnan(v) else f"f:{v!r}"
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


def canon_rows(cols: list[str], rows) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def duckdb_oracle_connection(sf_dir: str):
    """In-memory DuckDB with the ten fixture views registered — exactly
    what the driver does (FIXTURES.md 'Harness registration')."""
    import duckdb

    con = duckdb.connect()
    for t in ORACLE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@dataclass
class CompareResult:
    name: str
    spark_rows: int
    problems: list[str]

    @property
    def ok(self) -> bool:
        return not self.problems


def compare_query(spark, con, spec, sf_dir: str) -> CompareResult:
    """Run one QuerySpec on Spark and its oracle on DuckDB; diff them."""
    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if spec.oracle is None:
        return CompareResult(spec.name, len(srows), [])
    cur = con.execute(spec.oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    problems: list[str] = []
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
    if sorted(scols) != sorted(ocols):
        problems.append(f"cols spark={sorted(scols)} duckdb={sorted(ocols)}")
    # Decimal *width* must match too: the driver's value hash is sensitive
    # to DECIMAL(p,s), and Spark widens sum(DECIMAL(18,4)) to (28,4) while
    # DuckDB widens to (38,4) — identical values, different hash (round-1
    # red row agg_decimal_exact). canon() below is width-insensitive, so
    # check the declared types explicitly.
    sdec = {c: t for c, t in sdf.dtypes if t.startswith("decimal")}
    if sdec:
        rel = con.sql(spec.oracle)
        odec = {
            c: str(t).lower()
            for c, t in zip(rel.columns, rel.types)
            if str(t).upper().startswith("DECIMAL")
        }
        for c in sorted(sdec):
            if c in odec and odec[c] != sdec[c]:
                problems.append(
                    f"decimal width {c}: spark={sdec[c]} duckdb={odec[c]}"
                )
    if not problems:
        sc = canon_rows(scols, srows)
        oc = canon_rows(ocols, orows)
        if sc != oc:
            diffs = [(a, b) for a, b in zip(sc, oc) if a != b]
            detail = (
                f"first diff: spark={diffs[0][0][:160]!r} "
                f"duckdb={diffs[0][1][:160]!r}"
                if diffs
                else "row multiset mismatch"
            )
            problems.append(f"values differ ({len(diffs)}/{len(sc)} rows); {detail}")
    return CompareResult(spec.name, len(srows), problems)
