"""Round-15 flagship additions: SemDeDup semantic-tier deduplication
over the IVF k-means clusters, and token-budget-weighted domain
mixture sampling — the two pipeline stages a pretraining corpus
recipe runs between fuzzy dedup and training-set emission.

Grading pattern (the ``bq_knn_recall_verified`` contract): hashed
rows are exact facts DuckDB can state from the raw tables (planted
semantic twins, exact token accounting); the clustering/sampling
machinery is certified by census booleans computed from independent
recomputation, never by hashing engine-dependent internals.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

#: planted-twin id offset: far above any fixture vec_id at any SF
_TWIN_OFF = 100_000_000


@query(
    "dedup_semantic_clusters",
    "LLM-pipeline",
    oracle="""
    SELECT CAST(vec_id + 100000000 AS BIGINT) AS twin_id,
           CAST(vec_id AS BIGINT) AS src_id,
           TRUE AS dropped,
           TRUE AS twins_dropped_ok,
           TRUE AS drops_justified_ok,
           TRUE AS survivors_separated_ok,
           TRUE AS partition_exact_ok
    FROM embeddings
    WHERE vec_id % 17 = 3
    """,
)
def dedup_semantic_clusters(spark, sf_dir):
    """SemDeDup semantic dedup (round-14 VERDICT task 5 — Abbas et
    al. 2023, `operators/dedup.py:semantic_dedup`): the corpus plus
    one PLANTED identical twin per ``vec_id % 17 = 3`` vector runs
    through spherical-k-means clustering + within-cluster
    keep-lowest-id-per-ε-ball pruning (τ = 0.95).  An identical twin
    has cosine 1 with its lower-id source and lands in the same
    cluster under any assignment, so its fate is
    clustering-independent: the hashed rows are every twin's verdict
    (``dropped`` must read TRUE), restated by the oracle from the raw
    table.

    The kept-set itself depends on the codebook, so it is certified
    by INDEPENDENTLY recomputed census booleans instead of hashed:
    ``drops_justified_ok`` — every dropped vector has a same-cluster
    lower-id witness with cosine ≥ τ (no unforced drops);
    ``survivors_separated_ok`` — no two survivors of one cluster are
    ε-close (the SemDeDup postcondition); ``partition_exact_ok`` —
    verdicts partition the corpus exactly.  Together the three prove
    the output IS the greedy rule's fixpoint for whatever clustering
    ran.

    Scale posture: the only pair-generating step is the per-cluster
    self-join (k scales with n; the paper's k ≈ 100k at 5B vectors);
    codebook training is sample-based; assignment is one broadcast-k
    scan.  Composed into ``pretraining_corpus_recipe`` behind its
    ``semantic_dedup`` flag."""
    from ..operators.dedup import semantic_dedup
    from ..operators.similarity import cosine, unit

    tau = 0.95
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    twins = (emb.filter(F.col("vec_id") % 17 == 3)
             .select((F.col("vec_id") + _TWIN_OFF).alias("vec_id"),
                     "embedding"))
    corpus = emb.unionByName(twins)
    verdicts = semantic_dedup(corpus, k=8, tau=tau).localCheckpoint()
    # --- independent receipt recomputation (not the operator's pair
    # frame: a fresh per-cluster self-join over the verdicts) ---
    u = (corpus.select("vec_id", unit(F.col("embedding")).alias("_u"))
         .join(verdicts, "vec_id"))
    a = u.select(F.col("vec_id").alias("id1"), F.col("_u").alias("u1"),
                 "cid", F.col("dropped").alias("d1"))
    b = u.select(F.col("vec_id").alias("id2"), F.col("_u").alias("u2"),
                 F.col("cid").alias("cid2"), F.col("dropped").alias("d2"))
    close = (
        a.join(b, (F.col("cid") == F.col("cid2"))
               & (F.col("id1") < F.col("id2")))
        .filter(cosine(F.col("u1"), F.col("u2")) >= tau)
        .select("id1", "id2", "d1", "d2")
        .localCheckpoint()
    )
    separated = close.filter(~F.col("d1") & ~F.col("d2")) \
        .limit(1).count() == 0
    justified = (
        verdicts.filter(F.col("dropped"))
        .join(close.select(F.col("id2").alias("vec_id")).distinct(),
              "vec_id", "left_anti")
        .limit(1).count() == 0
    )
    partition_exact = verdicts.count() == corpus.count()
    twins_dropped = (
        verdicts.filter((F.col("vec_id") >= _TWIN_OFF)
                        & ~F.col("dropped"))
        .limit(1).count() == 0
    )
    return (
        verdicts.filter(F.col("vec_id") >= _TWIN_OFF)
        .select(
            F.col("vec_id").cast("bigint").alias("twin_id"),
            (F.col("vec_id") - _TWIN_OFF).cast("bigint").alias("src_id"),
            "dropped",
            F.lit(bool(twins_dropped)).alias("twins_dropped_ok"),
            F.lit(bool(justified)).alias("drops_justified_ok"),
            F.lit(bool(separated)).alias("survivors_separated_ok"),
            F.lit(bool(partition_exact)).alias("partition_exact_ok"),
        )
    )
