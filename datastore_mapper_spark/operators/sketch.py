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

The per-partition pass runs over Arrow batches (``mapInPandas``), not
row-at-a-time Python: each batch is pre-aggregated with
``value_counts()`` and folded into the k counters with the WEIGHTED
Misra–Gries update (Berinde et al., "Space-optimal heavy hitters with
strong error bounds").  The weighted update keeps the guarantee: every
decrement event removes δ from each of the k counters AND discards δ
of the incoming item's weight — (k+1)·δ total — so the sum of all
decrements is ≤ N_p/(k+1), any item's estimate undercounts by at most
that, and an item with partition count > N_p/k ≥ N_p/(k+1) ends with a
positive counter.  Order-independence of the bound is what makes
batch-level folding legal.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

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

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            # Arrow-batch pre-aggregation: one weighted update per
            # DISTINCT item in the batch, never per row.
            for item, weight in pdf[col].value_counts(dropna=True).items():
                w = int(weight)
                if item in counters:
                    counters[item] += w
                elif len(counters) < k:
                    counters[item] = w
                else:
                    # weighted decrement-all step; drop zeros, then
                    # insert any surviving remainder of the new item
                    d = min(w, min(counters.values()))
                    dead = []
                    for key in counters:
                        counters[key] -= d
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
                    if w > d:
                        counters[item] = w - d
        yield pd.DataFrame({"item": list(counters.keys())})

    schema = StructType(
        [StructField("item", df.schema[col].dataType, True)]
    )
    return df.select(col).mapInPandas(summarize, schema).distinct()
