"""Similarity search over embedding columns (array<float>).

Two paths:

- :func:`cosine_topk` — brute force: broadcast the query vector,
  JVM-side fold for the dot product, ``TakeOrderedAndProject`` top-k.
  O(N·d) per query; the right baseline, and the right *verifier* for
  any ANN index.
- :func:`ivf_topk` — IVF-style bucketed ANN: vectors are assigned to
  a deterministic coarse cell (sign pattern of leading dimensions ≙ a
  fixed hyperplane LSH codebook); queries probe only their own cell.
  At 100 TB the table is written partitioned by ``bucket`` so a probe
  is a partition-pruned scan; k-means centroids would replace the sign
  codebook without changing the dataflow.

Everything is expression-level (zip_with/aggregate) — no Python UDF in
the scoring loop; an Arrow pandas-UDF variant only wins once d is in
the thousands.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    """Element-wise double product folded in array order (bitwise
    reproducible — SURVEY §7.3-H3)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a, b) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def sign_bucket(emb, n_dims: int = 4) -> Column:
    """Deterministic coarse cell id from the signs of the first
    ``n_dims`` elements (2**n_dims cells)."""
    acc = F.lit(0)
    for i in range(n_dims):
        acc = acc + F.when(
            F.element_at(emb, i + 1) > 0, F.lit(1 << (n_dims - 1 - i))
        ).otherwise(F.lit(0))
    return acc


def cosine_topk(
    emb_df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of ``query_id`` (excluded)."""
    q = (
        emb_df.filter(F.col(id_col) == query_id)
        .select(F.col(vec_col).alias("qe"))
    )
    sim = F.round(cosine(F.col(vec_col), F.col("qe")), 4)
    return (
        emb_df.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(id_col, sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_topk(
    emb_df: DataFrame,
    query_id: int,
    k: int = 10,
    n_dims: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's coarse cell."""
    bucketed = emb_df.withColumn("bucket", sign_bucket(F.col(vec_col), n_dims))
    q = (
        bucketed.filter(F.col(id_col) == query_id)
        .select(F.col(vec_col).alias("qe"), F.col("bucket").alias("qbucket"))
    )
    sim = F.round(cosine(F.col(vec_col), F.col("qe")), 4)
    return (
        bucketed.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .filter(F.col("bucket") == F.col("qbucket"))
        .select(id_col, sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )
