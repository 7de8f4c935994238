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
    e = table(spark, sf_dir, "embeddings")
    q = (
        e.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("qe"))
        .withColumn("qq", _dot("qe", "qe"))
    )
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _dot("embedding", "qe")
                / (F.sqrt(_dot("embedding", "embedding")) * F.sqrt(F.col("qq"))),
                4,
            ).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(10)
    )
