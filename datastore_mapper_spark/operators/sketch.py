"""Mergeable frequency-sketch operators (the bounded-memory tier).

Misra–Gries is the classic deterministic heavy-hitter summary: a
stream pass with at most ``k`` counters such that any item whose true
count exceeds N/k survives in the summary.  Run per partition and
UNIONED, the guarantee lifts to the cluster: an item with GLOBAL count
> N/k must exceed N_p/k in at least one partition (sum argument), so
it appears in that partition's summary — the union is a provable
superset of every global heavy hitter.  A second exact pass counts
only the candidates, so the final ``count*k > N`` filter returns
EXACTLY the true heavy-hitter set — deterministic despite the
partition-dependent intermediate, which is what lets a SQL oracle
check the whole pipeline (`approx_topk_misra_gries`).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import StructField, StructType


def misra_gries_candidates(df: DataFrame, col: str, k: int = 32) -> DataFrame:
    """Per-partition Misra–Gries summaries, unioned.

    Returns a DataFrame with one column ``item`` — the candidate set
    (distinct), a guaranteed superset of all items with global count
    > N/k.  Memory is O(k) per partition regardless of stream length;
    no shuffle until the tiny candidate union is de-duplicated.
    """
    if k < 1:
        raise ValueError(f"misra_gries_candidates: k must be >= 1, got {k}")

    def summarize(rows: Iterator[Row]) -> Iterator[Row]:
        counters: dict = {}
        for row in rows:
            item = row[col]
            if item is None:
                continue
            if item in counters:
                counters[item] += 1
            elif len(counters) < k:
                counters[item] = 1
            else:
                # decrement-all step; drop zeros
                dead = []
                for key in counters:
                    counters[key] -= 1
                    if counters[key] == 0:
                        dead.append(key)
                for key in dead:
                    del counters[key]
        for item in counters:
            yield (item,)

    schema = StructType(
        [StructField("item", df.schema[col].dataType, True)]
    )
    rdd = df.select(col).rdd.mapPartitions(summarize)
    return df.sparkSession.createDataFrame(rdd, schema).distinct()
