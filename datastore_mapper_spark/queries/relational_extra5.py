"""Fifth extension suite: global-window shares, date-sequence
generation, JSON serialization, per-row array set algebra, split_part,
multi-reference CTEs.

Probed MATCH this session (Spark 4.1.2 vs DuckDB 1.0.0). Traps:
Spark ``array_intersect``/``array_except`` return DISTINCT elements —
the oracle wraps ``list_distinct``; DuckDB ``generate_series`` over
dates yields TIMESTAMP — cast back to DATE.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "window_global_share",
    "window",
    oracle="""
    SELECT o_orderstatus, count(*) AS cnt,
           round(CAST(count(*) AS DOUBLE)
                 / CAST(sum(count(*)) OVER () AS DOUBLE), 6) AS share
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def window_global_share(spark, sf_dir):
    """Empty-partition window over an aggregate (share of total) — one
    pass: grouped counts, then a scalar window instead of a self-join
    against the grand total."""
    table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS cnt,
               round(CAST(count(*) AS DOUBLE)
                     / sum(count(*)) OVER (), 6) AS share
        FROM orders
        GROUP BY o_orderstatus
        """
    )


@query(
    "fn_date_sequence",
    "array/table fn",
    oracle="""
    SELECT o_orderkey,
           CAST(unnest(generate_series(
               CAST(o_orderdate AS DATE),
               CAST(o_orderdate AS DATE) + 3,
               INTERVAL 1 DAY)) AS DATE) AS d
    FROM orders
    WHERE o_orderkey < 2000
    """,
)
def fn_date_sequence(spark, sf_dir):
    """Row → date-range expansion (``sequence`` + explode ≙
    ``generate_series``): the calendar-densification primitive behind
    gap-filling and per-day rollups of ranged records."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    d0 = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.explode(F.sequence(d0, F.date_add(d0, 3))).alias("d"),
    )


@query(
    "fn_to_json",
    "json fn",
    oracle="""
    SELECT n_nationkey,
           to_json(struct_pack(name := n_name, region := n_regionkey)) AS j
    FROM nation
    """,
)
def fn_to_json(spark, sf_dir):
    """Struct → JSON serialization (the write-side twin of #41/#91
    extraction); byte-identical rendering across engines for
    string/int fields."""
    n = table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.to_json(
            F.struct(F.col("n_name").alias("name"),
                     F.col("n_regionkey").alias("region"))
        ).alias("j"),
    )


@query(
    "fn_array_set_algebra",
    "array fn",
    oracle="""
    SELECT vec_id,
           CAST(len(list_distinct(list_intersect(a, b))) AS INT) AS n_int,
           CAST(len(list_distinct(
               list_filter(a, x -> NOT list_contains(b, x)))) AS INT) AS n_exc
    FROM (SELECT vec_id,
                 list_transform(embedding,
                                x -> CAST(round(x * 10) AS INTEGER))[1:20] AS a,
                 list_transform(embedding,
                                x -> CAST(round(x * 7) AS INTEGER))[1:20] AS b
          FROM embeddings WHERE vec_id < 500)
    """,
)
def fn_array_set_algebra(spark, sf_dir):
    """Per-row array set algebra (intersect/except) over derived int
    arrays — Spark's variants return DISTINCT elements, mirrored with
    list_distinct in the oracle."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    a = F.slice(F.expr("transform(embedding, x -> CAST(round(x*10) AS INT))"), 1, 20)
    b = F.slice(F.expr("transform(embedding, x -> CAST(round(x*7) AS INT))"), 1, 20)
    return e.select(
        "vec_id",
        F.size(F.array_intersect(a, b)).alias("n_int"),
        F.size(F.array_except(a, b)).alias("n_exc"),
    )


@query(
    "fn_split_part",
    "scalar fn",
    oracle="""
    SELECT doc_id, split_part(text, ' ', 1) AS w1,
           split_part(text, ' ', 3) AS w3
    FROM documents
    WHERE doc_id < 2000
    """,
)
def fn_split_part(spark, sf_dir):
    """Field extraction by delimiter index (1-based, same name and
    semantics in both engines)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    return d.select(
        "doc_id",
        F.split_part("text", F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part("text", F.lit(" "), F.lit(3)).alias("w3"),
    )


@query(
    "cte_multi_reference",
    "subquery",
    oracle="""
    WITH big AS (
        SELECT o_custkey, count(*) AS n, sum(o_totalprice) AS total
        FROM orders GROUP BY o_custkey HAVING count(*) >= 3
    )
    SELECT a.o_custkey, a.n,
           round(CAST(a.total AS DOUBLE)
                 / (SELECT CAST(sum(total) AS DOUBLE) FROM big), 6)
               AS share_of_big
    FROM big a
    """,
)
def cte_multi_reference(spark, sf_dir):
    """One CTE referenced twice (row source + scalar subquery) — the
    plan materializes/reuses the common subtree instead of
    re-aggregating orders twice."""
    table(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH big AS (
            SELECT o_custkey, count(*) AS n, sum(o_totalprice) AS total
            FROM orders GROUP BY o_custkey HAVING count(*) >= 3
        )
        SELECT a.o_custkey, a.n,
               round(CAST(a.total AS DOUBLE)
                     / (SELECT CAST(sum(total) AS DOUBLE) FROM big), 6)
                   AS share_of_big
        FROM big a
        """
    )


@query(
    "fn_levenshtein",
    "scalar fn",
    oracle="""
    SELECT doc_id,
           levenshtein(split_part(text, ' ', 1),
                       split_part(text, ' ', 2)) AS d12,
           levenshtein(split_part(text, ' ', 1),
                       split_part(text, ' ', 4)) AS d14
    FROM documents
    WHERE doc_id < 2000
    """,
)
def fn_levenshtein(spark, sf_dir):
    """Edit distance between token pairs — the fuzzy-match primitive
    under typo-tolerant dedup; same name and semantics both engines."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    w = lambda i: F.split_part("text", F.lit(" "), F.lit(i))  # noqa: E731
    return d.select(
        "doc_id",
        F.levenshtein(w(1), w(2)).alias("d12"),
        F.levenshtein(w(1), w(4)).alias("d14"),
    )


@query(
    "fn_trunc_week_quarter",
    "scalar fn",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qt,
           CAST(quarter(o_orderdate) AS INT) AS qn,
           CAST(weekofyear(o_orderdate) AS INT) AS wn
    FROM orders
    WHERE o_orderkey < 20000
    """,
)
def fn_trunc_week_quarter(spark, sf_dir):
    """Week/quarter truncation + ISO week numbering (both engines use
    Monday-start ISO weeks; Spark date_trunc yields TIMESTAMP — cast
    to DATE to align types)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 20000)
    return o.select(
        "o_orderkey",
        F.date_trunc("week", "o_orderdate").cast("date").alias("wk"),
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("qt"),
        F.quarter("o_orderdate").alias("qn"),
        F.weekofyear("o_orderdate").alias("wn"),
    )
