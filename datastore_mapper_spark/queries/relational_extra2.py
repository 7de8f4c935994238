"""Second relational-extension suite: percentiles, higher-order array
functions, conditional aggregates, lateral joins, unpivot, RANGE window
frames, error-safe functions, uncorrelated scalar subqueries.

Dialect parity for every row here was probed empirically this session
(Spark 4.1.2 vs DuckDB 1.0.0, value-level MATCH at sf0.001) before
being declared; the notes on each query record the trap it routes
around (SURVEY §7.3-H6 discipline).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "agg_percentile_median",
    "aggregation",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
           count(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile_median(spark, sf_dir):
    """Exact interpolated percentiles: Spark ``percentile`` ≙ DuckDB
    ``quantile_cont`` (both linear interpolation; probed MATCH)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", 0.5), 4).alias("med_qty"),
        F.round(F.percentile("l_extendedprice", 0.9), 4).alias("p90_price"),
        F.count("*").alias("cnt"),
    )


@query(
    "fn_higher_order_array",
    "array fn",
    oracle="""
    SELECT vec_id,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           round(list_aggregate(
               list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               'sum'), 4) AS sum_sq
    FROM embeddings
    WHERE vec_id < 500
    """,
)
def fn_higher_order_array(spark, sf_dir):
    """Lambda higher-order functions over array<float>: filter /
    transform / aggregate (fold).  Elements cast to DOUBLE *inside* the
    lambda on both sides so the multiply happens at the same precision
    (float*float would round differently)."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    return e.select(
        "vec_id",
        F.expr("size(filter(embedding, x -> x > 0))").alias("n_pos"),
        F.expr(
            "round(aggregate(embedding, cast(0.0 as double), "
            "(acc, x) -> acc + cast(x as double) * cast(x as double)), 4)"
        ).alias("sum_sq"),
    )


@query(
    "agg_conditional_bools",
    "aggregation",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_big,
           bool_or(o_orderstatus = 'F') AS any_f,
           bool_and(o_totalprice > 0) AS all_positive
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_conditional_bools(spark, sf_dir):
    """Conditional/boolean aggregates: ``count_if`` (oracle spelled as
    the SUM-CASE it is defined as, avoiding DuckDB version drift),
    ``bool_or``/``bool_and``."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_f"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
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
    "unpivot_measures",
    "reshape",
    oracle="""
    SELECT * FROM (
        SELECT l_orderkey, l_linenumber,
               l_extendedprice, l_discount, l_tax
        FROM lineitem WHERE l_orderkey < 1000
    ) UNPIVOT (val FOR measure IN (l_extendedprice, l_discount, l_tax))
    """,
)
def unpivot_measures(spark, sf_dir):
    """Wide→long reshape (UNPIVOT ≙ ``DataFrame.unpivot``); the inverse
    of agg_pivot.  Both engines drop NULL measure values by default."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey", "l_linenumber",
        "l_extendedprice", "l_discount", "l_tax",
    ).unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )


@query(
    "window_range_frame",
    "window frame",
    oracle="""
    SELECT o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice
               RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW), 4) AS rsum
    FROM orders
    """,
)
def window_range_frame(spark, sf_dir):
    """Value-based RANGE frame (vs the ROWS frames of #26/#27): sum of
    all orders within 1000.0 below the current price per customer.
    RANGE frames include ties identically in both engines."""
    table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_totalprice
                   RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW), 4) AS rsum
        FROM orders
        """
    )


@query(
    "fn_try_safe",
    "scalar fn",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN o_orderpriority
                         ELSE CAST(o_orderkey AS VARCHAR) END
                    AS BIGINT) AS tc,
           round(o_totalprice / NULLIF(CAST(o_orderkey % 5 AS DOUBLE), 0.0),
                 4) AS td
    FROM orders
    WHERE o_orderkey < 20000
    """,
)
def fn_try_safe(spark, sf_dir):
    """Error-safe functions: ``try_cast`` (NULL on bad parse) and
    ``try_divide`` (NULL on /0 — the oracle spells it NULLIF, the
    semantics try_divide is defined by)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 20000)
    return o.select(
        "o_orderkey",
        F.expr(
            "try_cast(CASE WHEN o_orderkey % 3 = 0 THEN o_orderpriority "
            "ELSE CAST(o_orderkey AS STRING) END AS BIGINT)"
        ).alias("tc"),
        F.round(
            F.try_divide(F.col("o_totalprice"),
                         (F.col("o_orderkey") % 5).cast("double")),
            4,
        ).alias("td"),
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
