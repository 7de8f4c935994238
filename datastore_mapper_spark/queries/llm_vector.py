"""LLM-pipeline vector contract queries (SURVEY §2.B #49) over the
``embeddings`` table (array<float>, 64-d).

Both engines compute the identical dot/norm arithmetic — element-wise
double products folded in array order — so the cosine is bitwise
reproducible before the 4-dp round (SURVEY §7.3-H3).  The IVF-bucketed
scale path and brute-force library form live in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


def _dot(a: str, b: str):
    """Sum of element-wise double products, folded left-to-right."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@query(
    "knn_cosine_top10",
    "LLM-pipeline",
    oracle="""
    WITH q AS (
        SELECT embedding AS qe,
               (SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                FROM (SELECT unnest(embedding) AS x)) AS qq
        FROM embeddings WHERE vec_id = 0
    ), sims AS (
        SELECT e.vec_id,
               (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                FROM (SELECT unnest(e.embedding) AS x, unnest(q.qe) AS y))
                 AS dot,
               (SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                FROM (SELECT unnest(e.embedding) AS x)) AS dd,
               q.qq AS qq
        FROM embeddings e, q
        WHERE e.vec_id <> 0
    )
    SELECT vec_id, round(dot / (sqrt(dd) * sqrt(qq)), 4) AS sim
    FROM sims
    ORDER BY sim DESC, vec_id
    LIMIT 10
    """,
)
def knn_cosine_top10(spark, sf_dir):
    """Brute-force cosine top-10 neighbors of vec_id=0.  The query vector
    is broadcast; Spark plans TakeOrderedAndProject for the top-k (no
    global sort).  Scale path: operators.similarity.ivf_topk."""
    return (
        cosine_scored(spark, sf_dir)
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(10)
    )


def cosine_scored(spark, sf_dir, qid: int = 0):
    """Every vector's 4-dp-rounded cosine to the ``qid`` query vector
    (query excluded) — the scored relation behind ``knn_cosine_top10``,
    shared with reciprocal-rank fusion which ranks a deeper list."""
    e = table(spark, sf_dir, "embeddings")
    q = (
        e.filter(F.col("vec_id") == qid)
        .select(F.col("embedding").alias("qe"))
        .withColumn("qq", _dot("qe", "qe"))
    )
    return (
        e.filter(F.col("vec_id") != qid)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _dot("embedding", "qe")
                / (F.sqrt(_dot("embedding", "embedding")) * F.sqrt(F.col("qq"))),
                4,
            ).alias("sim"),
        )
    )


@query(
    "knn_batch_top3",
    "LLM-pipeline",
    oracle="""
    WITH q AS (
        SELECT vec_id AS qid, embedding AS qe,
               (SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                FROM (SELECT unnest(embedding) AS x)) AS qq
        FROM embeddings WHERE vec_id < 10
    ), sims AS (
        SELECT q.qid, e.vec_id AS cid,
               (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                FROM (SELECT unnest(e.embedding) AS x, unnest(q.qe) AS y))
                 AS dot,
               (SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                FROM (SELECT unnest(e.embedding) AS x)) AS dd,
               q.qq AS qq
        FROM embeddings e, q
        WHERE e.vec_id <> q.qid
    ), ranked AS (
        SELECT qid, cid,
               round(dot / (sqrt(dd) * sqrt(qq)), 4) AS sim,
               row_number() OVER (
                   PARTITION BY qid
                   ORDER BY round(dot / (sqrt(dd) * sqrt(qq)), 4) DESC, cid
               ) AS rn
        FROM sims
    )
    SELECT qid, cid, sim, rn FROM ranked WHERE rn <= 3
    """,
)
def knn_batch_top3(spark, sf_dir):
    """Batched ANN baseline: top-3 cosine neighbors for EACH of 10 query
    vectors in one pass — the realistic retrieval shape (a query batch,
    not a single probe).  The 10-row query side broadcasts, so the scan
    of the candidate side streams once with no shuffle; ranking is a
    window partitioned by query id, planned with WindowGroupLimit.  At
    100 TB the candidate set per query is first cut by IVF cells
    (operators.similarity.ivf_topk) and this brute-force scoring runs
    only inside the probed cells.  Similarity pinned at 4 dp and
    tie-broken on candidate id (§7.3-H2/H7)."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "embeddings")
    q = (
        e.filter(F.col("vec_id") < 10)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
        .withColumn("qq", _dot("qe", "qe"))
    )
    sims = e.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).select(
        "qid",
        F.col("vec_id").alias("cid"),
        F.round(
            _dot("embedding", "qe")
            / (F.sqrt(_dot("embedding", "embedding")) * F.sqrt(F.col("qq"))),
            4,
        ).alias("sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("qid", "cid", "sim", "rn")
    )
