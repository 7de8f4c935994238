"""Scan / projection / filter contract queries (SURVEY §2.B #1–#4).

These are the Spark expression of the reference's query surface: the
filtered scan (datastore query filters; reference job config, SURVEY
§2.A A3) and the projection / keys-only scan (A4).  Spark is strictly
more general — predicates and column pruning push down to the parquet
scan automatically (check ``PushedFilters`` / ``ReadSchema`` in
``df.explain``), which is the engine-side analogue of Datastore index
scans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "scan_project",
    "scan/project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    """,
)
def scan_project(spark, sf_dir):
    """Column pruning + arithmetic derivation over the fact table."""
    li = table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (1 + F.col("l_tax"))).alias("charge"),
    )


@query(
    "scan_filter_pushdown",
    "filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'R')
      AND l_linestatus LIKE 'F%'
    """,
)
def scan_filter_pushdown(spark, sf_dir):
    """Equality + range + IN + LIKE predicates, all parquet-pushable."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_linestatus").like("F%")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@query(
    "filter_null_semantics",
    "filter",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderstatus, 'O') AS st,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS st_filled
    FROM orders
    WHERE nullif(o_orderstatus, 'O') IS NULL
       OR nullif(o_orderstatus, 'O') = 'F'
    """,
)
def filter_null_semantics(spark, sf_dir):
    """IS NULL / three-valued logic over a derived nullable column."""
    o = table(spark, sf_dir, "orders")
    st = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        st.alias("st"),
        F.coalesce(st, F.lit("OPEN")).alias("st_filled"),
    ).filter(F.col("st").isNull() | (F.col("st") == "F"))


@query(
    "case_when_bucketing",
    "project",
    oracle="""
    SELECT CASE
             WHEN o_totalprice < 50000 THEN 'low'
             WHEN o_totalprice BETWEEN 50000 AND 150000 THEN 'mid'
             ELSE 'high'
           END AS bucket,
           count(*) AS cnt,
           sum(o_totalprice) AS total
    FROM orders
    GROUP BY 1
    """,
)
def case_when_bucketing(spark, sf_dir):
    """CASE WHEN bucketing with BETWEEN, then a stabilizing rollup."""
    o = table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice").between(50000, 150000), "mid")
        .otherwise("high")
    )
    return (
        o.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"), F.sum("o_totalprice").alias("total"))
    )
