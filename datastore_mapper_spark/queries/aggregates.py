"""Aggregation contract queries (SURVEY §2.B #5–#13).

The reference has no grouped-aggregation operator — counters
(counters.go, SURVEY §2.A A6) and downstream BigQuery did this work.
Here it is first-class: Spark plans every ``groupBy().agg()`` as
partial (map-side) -> shuffle-by-key -> final hash aggregation, which
is the scalable form of the reference's slice->shard->job counter
roll-up.

Oracle notes (SURVEY §7.3): DuckDB sums integers to HUGEINT — oracle
SQL casts to BIGINT; ratio math is cast to DOUBLE to dodge DuckDB's
decimal-literal inference.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "agg_global",
    "aggregation",
    oracle="""
    SELECT sum(l_quantity) AS sum_qty,
           avg(l_extendedprice) AS avg_price,
           min(l_shipdate) AS min_ship,
           max(l_shipdate) AS max_ship,
           count(*) AS cnt
    FROM lineitem
    """,
)
def agg_global(spark, sf_dir):
    """Global (no GROUP BY) sum/avg/min/max/count in one pass."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.avg("l_extendedprice").alias("avg_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        F.count("*").alias("cnt"),
    )


@query(
    "agg_group_pricing_summary",
    "aggregation",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           sum(l_extendedprice) AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
           sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
           avg(l_quantity) AS avg_qty,
           avg(l_extendedprice) AS avg_price,
           avg(l_discount) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary: multi-aggregate GROUP BY."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_having",
    "aggregation",
    oracle="""
    SELECT o_custkey, count(*) AS order_cnt, sum(o_totalprice) AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 12
    """,
)
def agg_having(spark, sf_dir):
    """Post-aggregation filter (HAVING)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("order_cnt"), F.sum("o_totalprice").alias("total_spent"))
        .filter(F.col("order_cnt") >= 12)
    )


@query(
    "agg_count_distinct",
    "aggregation",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS uniq_users
    FROM events
    GROUP BY event_type
    """,
)
def agg_count_distinct(spark, sf_dir):
    """Exact count(DISTINCT) per group (expand + two-phase agg in Spark)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("uniq_users")
    )


@query(
    "agg_multi_distinct",
    "aggregation",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS uniq_users,
           count(DISTINCT date_trunc('day', ts::TIMESTAMP)) AS active_days
    FROM events
    GROUP BY event_type
    """,
)
def agg_multi_distinct(spark, sf_dir):
    """Two DISTINCT aggregates over different keys in one query."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("uniq_users"),
        F.countDistinct(F.date_trunc("day", F.col("ts_us"))).alias("active_days"),
    )


@query(
    "agg_rollup",
    "grouping sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           count(*) AS cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    """ROLLUP hierarchy with NULL grouping keys."""
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("cnt")
    )


@query(
    "agg_cube",
    "grouping sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           count(*) AS cnt
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark, sf_dir):
    """CUBE: all grouping-set combinations."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("cnt")
    )


@query(
    "agg_grouping_sets",
    "grouping sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS INT) AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_priority,
           count(*) AS cnt,
           sum(o_totalprice) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS with grouping() membership markers."""
    table(spark, sf_dir, "orders")  # ensure the temp view exists
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               count(*) AS cnt,
               sum(o_totalprice) AS total
        FROM orders
        GROUP BY o_orderstatus, o_orderpriority
            GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_decimal_exact",
    "aggregation",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                     AS DECIMAL(38,4)) AS DOUBLE) AS sum_price_dec,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4)))
                     AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty_dec
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_decimal_exact(spark, sf_dir):
    """Decimal-cast exact sums — FP-determinism armor (SURVEY §7.3-H2).

    The ACCUMULATION is exact decimal arithmetic on both engines (the
    point of the query); only the FINAL, already-exact sum is cast to
    DOUBLE on both sides.  Rationale: this row hashed red in rounds 1-3
    even with matching DECIMAL(38,4) widths and bitwise-equal values —
    the driver's value canonicalization of Decimal objects (trailing
    zeros / repr) disagrees between the two engines.  Casting the same
    exact decimal to double yields the identical nearest double on both
    sides, which canonicalizes identically (round-4 VERDICT item 5).
    """
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("decimal(38,4)")
        .cast("double")
        .alias("sum_price_dec"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)"))
        .cast("decimal(38,4)")
        .cast("double")
        .alias("sum_qty_dec"),
    )
