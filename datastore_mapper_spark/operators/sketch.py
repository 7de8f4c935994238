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


def tdigest_partials(df: DataFrame, col: str, delta: int = 100
                     ) -> DataFrame:
    """Per-partition t-digest centroids (Dunning & Ertl, "Computing
    extremely accurate quantiles using t-digests") over Arrow batches
    — the MERGEABLE quantile sketch: each partition compresses its
    values into at most ~2·delta (mean, weight) centroids whose sizes
    obey the k1 scale function (tiny clusters near q=0/1, big in the
    middle), so tail quantiles stay sharp.  Returns the unioned
    centroid frames (one task's output is O(delta) rows, so the union
    across a 1000-executor scan is executor-count-sized — the shape
    that makes cluster-wide quantiles a driver-trivial final merge)."""
    import numpy as np

    from pyspark.sql.types import DoubleType

    schema = StructType([
        StructField("mean", DoubleType()),
        StructField("weight", DoubleType()),
    ])

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vals: list = []
        for pdf in batches:
            v = pdf[col].dropna().to_numpy(dtype="float64")
            if len(v):
                vals.append(v)
        if not vals:
            return
        allv = np.concatenate(vals)
        means, weights = _tdigest_compress(
            allv, np.ones(len(allv)), delta)
        yield pd.DataFrame({"mean": means, "weight": weights})

    return df.select(col).mapInPandas(summarize, schema)


def _tdigest_compress(values, weights, delta: int):
    """One merging-t-digest pass: sort, then sweep clusters whose
    cumulative k1-scale span stays <= 1 (k1(q) = delta/(2π) ·
    asin(2q−1); its unit steps bound cluster q-width to ~2·sin(π/δ)
    scaled by sqrt(q(1−q)) — the accuracy-vs-size law of the paper)."""
    import numpy as np

    order = np.argsort(values, kind="stable")
    v, w = values[order], weights[order]
    total = w.sum()
    k_of = lambda q: delta / (2 * np.pi) * np.arcsin(2 * q - 1)  # noqa: E731
    means: list[float] = []
    outw: list[float] = []
    csum = 0.0
    i = 0
    n = len(v)
    while i < n:
        k_lo = k_of(csum / total)
        # greedily absorb while the cluster's k-span stays within 1
        acc_w = w[i]
        acc_sum = v[i] * w[i]
        j = i + 1
        while j < n:
            q_hi = (csum + acc_w + w[j]) / total
            if k_of(min(q_hi, 1.0)) - k_lo > 1.0:
                break
            acc_w += w[j]
            acc_sum += v[j] * w[j]
            j += 1
        means.append(acc_sum / acc_w)
        outw.append(acc_w)
        csum += acc_w
        i = j
    return means, outw


def tdigest_quantiles(df: DataFrame, col: str, probs: list[float],
                      delta: int = 100) -> list[float]:
    """Cluster-shape t-digest quantiles: per-partition digests
    (executors) -> ONE driver-side merge of the O(executors · delta)
    centroid union -> interpolation.  The driver never sees raw rows;
    at 1000 executors the merge input is ~100k tiny tuples — the same
    driver-state class as the Misra–Gries candidate union."""
    import numpy as np

    parts = tdigest_partials(df, col, delta).collect()
    if not parts:
        return [float("nan")] * len(probs)
    means = np.array([r["mean"] for r in parts])
    ws = np.array([r["weight"] for r in parts])
    means, ws = (np.array(x) for x in _tdigest_compress(means, ws, delta))
    total = ws.sum()
    # centroid q-midpoints, then piecewise-linear interpolation
    cum = np.cumsum(ws) - ws / 2.0
    qs = cum / total
    out = []
    for p in probs:
        if p <= qs[0]:
            out.append(float(means[0]))
        elif p >= qs[-1]:
            out.append(float(means[-1]))
        else:
            out.append(float(np.interp(p, qs, means)))
    return out
