"""Iterative graph operators beyond connected components.

PageRank is the canonical iterate-until-converged dataflow: one join +
one aggregation per iteration, shuffling on node id both times, with
``localCheckpoint`` cutting lineage per round exactly like
``dedup.connected_components``.  At 100 TB: pre-partition edges and
ranks on the SAME key so the per-iteration join is co-located, use
reliable ``checkpoint()`` instead of local, and stop on an L1-delta
threshold read off one tiny aggregate per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iterations: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """(node, rank) PageRank over a directed edge list.

    Standard damped formulation with dangling-mass redistribution:
    every node's rank is (1-d)/N plus d times the inbound contribution
    sum plus its share of the mass parked on dangling (out-degree 0)
    nodes, so Σ rank = 1 holds at every iteration (asserted in
    tests/test_operators.py).  Stops early when the L1 delta between
    iterations drops below ``tol``.
    """
    # Checkpoint the EDGE LIST first: callers hand us edges that may be
    # an expensive plan (the near-dup pair join costs ~80 s at sf0.1),
    # and everything below — nodes, degrees, weights, and the
    # per-iteration dangling anti-join — derives from it.  Without this
    # cut the upstream plan re-executes EVERY iteration through the
    # uncheckpointed out_deg reference (measured: 20 x 80 s ≈ 27 min
    # for what should be a 2-minute query).
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # edge weight = 1/out_degree(src), materialized once
    w = e.join(out_deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("deg")).alias("w")
    ).localCheckpoint()
    # dangling (out-degree 0) node SET is iteration-invariant; only the
    # mass parked on it changes — carry it as a flag column so the
    # per-iteration mass rides the SAME aggregate as the delta (one
    # driver job per iteration instead of two; with the eager
    # checkpoint that's 2 jobs/iteration, was 3 — on a graph whose
    # per-job cost is dominated by fixed overhead this was a third of
    # the query's 26 s)
    flagged = nodes.join(
        out_deg.select(F.col("src").alias("node"),
                       F.lit(True).alias("dang_no")),
        "node",
        "left",
    ).select("node", F.col("dang_no").isNull().alias("dang"))
    ranks = flagged.select(
        "node", "dang", F.lit(1.0 / n).alias("rank")
    ).localCheckpoint()
    # uniform init makes the first dangling mass exact: |dangling| / n
    dangling = (
        ranks.agg(F.sum(F.col("dang").cast("int"))).first()[0] or 0
    ) / n
    base = (1.0 - damping) / n
    for _ in range(max_iterations):
        contrib = (
            w.join(ranks, w.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("w") * F.col("rank")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inbound"))
        )
        new_ranks = (
            flagged.join(contrib, "node", "left")
            .select(
                "node",
                "dang",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inbound"), F.lit(0.0))
                       + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        # one aggregate yields BOTH the convergence delta and the next
        # iteration's dangling mass
        row = (
            new_ranks.alias("n")
            .join(ranks.select("node", "rank").alias("o"), "node")
            .agg(
                F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))).alias("d"),
                F.coalesce(
                    F.sum(F.when(F.col("n.dang"), F.col("n.rank"))),
                    F.lit(0.0),
                ).alias("m"),
            )
            .first()
        )
        ranks = new_ranks
        dangling = row.m
        if row.d < tol:
            break
    return ranks.select("node", "rank")


def kcore(
    edges: DataFrame,
    k: int = 2,
    src: str = "d1",
    dst: str = "d2",
    max_iterations: int = 50,
) -> DataFrame:
    """Nodes of the k-core: the maximal subgraph where every node has
    degree >= k, by iterative peeling — drop all nodes with degree
    < k, restrict the edge list to survivors, repeat until a fixpoint.

    No recursive CTE can express this (the recursion needs an
    aggregate per step), so the oracle-side check is a pure-Python
    peel in pytest rather than DuckDB SQL.  Per round: one degree
    aggregate + one semi-join on each endpoint, all shuffling on node
    id; ``localCheckpoint`` cuts lineage per round exactly like
    ``dedup.connected_components`` (at 100 TB: reliable
    ``checkpoint()`` + edges pre-partitioned on node id).  Rounds
    needed = peel depth, small in practice for near-dup graphs.

    Returns (node, degree) for k-core members, with the degree INSIDE
    the core — deterministic, so any two runs (and the pytest
    reference) agree exactly.
    """
    if k < 1:
        raise ValueError(f"kcore: k must be >= 1, got {k}")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    n_edges = e.count()
    for _ in range(max_iterations):
        deg = e.groupBy("u").agg(F.count("*").alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("u")
        pruned = (
            e.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
            .localCheckpoint()
        )
        # fixpoint when no directed edge was removed this round (one
        # count job per round; the prior round's size is remembered,
        # not recounted)
        n_pruned = pruned.count()
        e = pruned
        if n_pruned == n_edges:
            break
        n_edges = n_pruned
    return (
        e.groupBy("u")
        .agg(F.count("*").cast("long").alias("degree"))
        .filter(F.col("degree") >= k)
        .select(F.col("u").alias("node"), "degree")
    )
