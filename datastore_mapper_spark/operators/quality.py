"""Declarative data-quality expectations — the validation gate a
pipeline runs before promoting a table (the engine-side analogue of
Great Expectations / dbt tests, public concepts).

All expectations for a table evaluate in ONE aggregate pass
(``count_if`` per rule — map-side combinable, no per-rule scans), so a
100 TB validation costs one scan regardless of rule count.  Uniqueness
is the exception (needs a groupBy); it runs as a second aggregate on
just the key columns.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Expectation:
    """One named rule: ``violation`` is a boolean Column that is true
    for every ROW violating the rule."""

    name: str
    violation: Column


def not_null(col: str) -> Expectation:
    return Expectation(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Expectation:
    return Expectation(
        f"in_range({col})",
        F.col(col).isNotNull() & ~F.col(col).between(lo, hi),
    )


def accepted_values(col: str, values: list) -> Expectation:
    return Expectation(
        f"accepted_values({col})",
        F.col(col).isNotNull() & ~F.col(col).isin(values),
    )


def matches_regex(col: str, pattern: str) -> Expectation:
    return Expectation(
        f"matches_regex({col})",
        F.col(col).isNotNull() & ~F.col(col).rlike(pattern),
    )


def validate(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """(rule, n_violations, n_rows) — one aggregate pass over ``df``."""
    agg = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.count(F.when(e.violation, 1)).alias(f"v_{i}")
            for i, e in enumerate(expectations)
        ],
    )
    rows = agg.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(e.name).alias("rule"),
                    F.col(f"v_{i}").alias("n_violations"),
                    F.col("n_rows").alias("n_rows"),
                )
                for i, e in enumerate(expectations)
            ])
        ).alias("r")
    )
    return rows.select("r.rule", "r.n_violations", "r.n_rows")


def expect_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """(rule, n_violations, n_rows) for a uniqueness expectation:
    n_violations = rows carrying a duplicated key (rows minus distinct
    keys... counted as rows in groups of size > 1)."""
    dup_rows = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("dup_rows"))
    )
    total = df.agg(F.count(F.lit(1)).alias("n_rows"))
    return dup_rows.crossJoin(total).select(
        F.lit(f"unique({', '.join(cols)})").alias("rule"),
        F.col("dup_rows").alias("n_violations"),
        "n_rows",
    )
