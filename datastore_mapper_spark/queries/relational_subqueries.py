"""Extension relational-shape queries: correlated/uncorrelated
subqueries, lateral top-n, null-safe joins, multi-reference CTEs,
ALL-variant set ops, relational division, doc-embedding joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "subquery_correlated",
    "subquery",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (
        SELECT avg(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def subquery_correlated(spark, sf_dir):
    """Correlated scalar subquery — Catalyst decorrelates to an
    aggregate + join (RewriteCorrelatedScalarSubquery), the plan you'd
    hand-write at scale."""
    table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o
        WHERE o.o_totalprice > 1.5 * (
            SELECT avg(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@query(
    "scalar_subquery_uncorrelated",
    "subquery",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS cnt,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    GROUP BY o_orderstatus
    """,
)
def scalar_subquery_uncorrelated(spark, sf_dir):
    """Uncorrelated scalar subquery in a predicate (planned as a
    one-row broadcast, not a rescan per row)."""
    table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               count(*) AS cnt,
               round(avg(o_totalprice), 4) AS avg_price
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        GROUP BY o_orderstatus
        """
    )


@query(
    "join_lateral_topn",
    "join",
    oracle="""
    SELECT n.n_name, s.s_name, s.s_acctbal
    FROM nation n, LATERAL (
        SELECT s_name, s_acctbal
        FROM supplier
        WHERE s_nationkey = n.n_nationkey
        ORDER BY s_acctbal DESC, s_suppkey
        LIMIT 1
    ) s
    """,
)
def join_lateral_topn(spark, sf_dir):
    """Correlated LATERAL subquery with ORDER BY + LIMIT — per-nation
    top-1 supplier.  Inner (not left) lateral on both sides: nations
    without suppliers drop out.  Tie-broken on s_suppkey (§7.3-H7)."""
    table(spark, sf_dir, "nation")
    table(spark, sf_dir, "supplier")
    return spark.sql(
        """
        SELECT n.n_name, s.s_name, s.s_acctbal
        FROM nation n JOIN LATERAL (
            SELECT s_name, s_acctbal
            FROM supplier
            WHERE s_nationkey = n.n_nationkey
            ORDER BY s_acctbal DESC, s_suppkey
            LIMIT 1
        ) s
        """
    )


@query(
    "join_nullsafe_eq",
    "join",
    oracle="""
    SELECT count(*) AS n_pairs
    FROM (SELECT nullif(o_orderstatus, 'P') AS a FROM orders
          WHERE o_orderkey < 2000) x
    JOIN (SELECT nullif(o_orderstatus, 'P') AS b FROM orders
          WHERE o_orderkey < 500) y
      ON x.a IS NOT DISTINCT FROM y.b
    """,
)
def join_nullsafe_eq(spark, sf_dir):
    """Null-safe equality join: Spark ``<=>`` ≙ SQL ``IS NOT DISTINCT
    FROM`` — NULL keys match each other (a plain equi-join drops
    them), still planned as a hash join, not a nested loop."""
    o = table(spark, sf_dir, "orders")
    x = (o.filter(F.col("o_orderkey") < 2000)
         .select(F.nullif("o_orderstatus", F.lit("P")).alias("a")))
    y = (o.filter(F.col("o_orderkey") < 500)
         .select(F.nullif("o_orderstatus", F.lit("P")).alias("b")))
    return x.join(y, x.a.eqNullSafe(y.b)).agg(F.count("*").alias("n_pairs"))


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
    "set_intersect_all",
    "set op",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    """,
)
def set_intersect_all(spark, sf_dir):
    """Bag-semantics INTERSECT ALL (multiplicity = min of the two
    sides), complementing the distinct variant #33."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    return a.intersectAll(b)


@query(
    "set_except_all",
    "set op",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    """,
)
def set_except_all(spark, sf_dir):
    """Bag-semantics EXCEPT ALL (multiplicity subtraction),
    complementing the distinct variant #34."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    return a.exceptAll(b)


@query(
    "relational_division_all_years",
    "join/subquery",
    oracle="""
    WITH yrs AS (SELECT count(DISTINCT year(o_orderdate)) AS n_years
                 FROM orders)
    SELECT o.o_custkey AS custkey,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    GROUP BY o.o_custkey
    HAVING count(DISTINCT year(o_orderdate)) = (SELECT n_years FROM yrs)
    """,
)
def relational_division_all_years(spark, sf_dir):
    """Relational division ("for all"): customers with orders in EVERY
    year the table covers — the universal-quantification shape that SQL
    has no direct operator for, composed as per-group distinct count ==
    broadcast global distinct count.  One shuffle on custkey; the
    1-row divisor crosses in as a broadcast, never a driver-side
    collect."""
    o = table(spark, sf_dir, "orders")
    yrs = o.select(F.year("o_orderdate").alias("y")).agg(
        F.countDistinct("y").alias("n_years")
    )
    per_cust = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count("*").alias("n_orders"),
        F.countDistinct(F.year("o_orderdate")).alias("cust_years"),
    )
    return (
        per_cust.crossJoin(F.broadcast(yrs))
        .filter(F.col("cust_years") == F.col("n_years"))
        .select("custkey", "n_orders")
    )


@query(
    "doc_embedding_join",
    "LLM-pipeline",
    oracle="""
    SELECT d.lang,
           count(*) AS n_docs,
           round(avg(sqrt(list_aggregate(list_transform(e.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 4)
               AS avg_l2_norm,
           CAST(sum(d.n_chars) AS BIGINT) AS total_chars
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY d.lang
    """,
)
def doc_embedding_join(spark, sf_dir):
    """Cross-modal join: text metadata × vector norms per language —
    the text and embedding tables share the id space, so multimodal
    enrichment is a plain (bucketable) equi-join, not a special
    operator."""
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    norm = F.sqrt(F.expr(
        "aggregate(embedding, cast(0.0 as double), "
        "(a, x) -> a + cast(x as double) * cast(x as double))"
    ))
    return (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(norm), 4).alias("avg_l2_norm"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "recursive_cte_date_spine",
    "subquery/recursive",
    oracle="""
    WITH RECURSIVE days(d) AS (
        SELECT TIMESTAMP '1997-01-01 00:00:00'
        UNION ALL
        SELECT d + INTERVAL 1 DAY FROM days
        WHERE d < TIMESTAMP '1997-03-31 00:00:00'
    )
    SELECT d AS day, CAST(count(o_orderkey) AS BIGINT) AS n_orders
    FROM days LEFT JOIN orders
      ON date_trunc('day', o_orderdate) = d
    GROUP BY d
    """,
)
def recursive_cte_date_spine(spark, sf_dir):
    """Recursive CTE (Spark 4's WITH RECURSIVE) generating a 90-day
    calendar spine, left-joined to per-day order counts — the
    gap-filling densification every time-series rollup needs (days
    with zero orders survive with n_orders = 0, which a plain GROUP BY
    silently drops).  The recursion is driver-side tiny (one row per
    day); the join and count distribute as usual."""
    table(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH RECURSIVE days(d) AS (
            SELECT TIMESTAMP '1997-01-01 00:00:00'
            UNION ALL
            SELECT d + INTERVAL 1 DAY FROM days
            WHERE d < TIMESTAMP '1997-03-31 00:00:00'
        )
        SELECT d AS day, count(o_orderkey) AS n_orders
        FROM days LEFT JOIN orders
          ON date_trunc('day', o_orderdate) = d
        GROUP BY d
        """
    )
