"""Window-function contract queries (SURVEY §2.B #23–#30, incl. sorts
and top-k).

Window functions are pure BigQuery-surface territory (the reference
exported data precisely to run these downstream).  Physical note for
scale: every window here partitions by a key before ordering, so the
sort is per-partition after a hash shuffle — never a global sort.  The
two global-order queries (#28 ntile, #30 top-k) are the exception;
Spark plans #30 as ``TakeOrderedAndProject`` (per-partition heap +
driver merge), which is the scalable top-k physical form.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "window_rank_topn_per_group",
    "window",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(rank() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC) AS INT) AS rnk
        FROM orders
    ) WHERE rnk <= 3
    """,
)
def window_rank_topn_per_group(spark, sf_dir):
    """Top-3 orders per customer via rank() — the per-group top-k idiom."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@query(
    "window_row_number_dedup",
    "window",
    oracle="""
    SELECT event_id, user_id, event_type, ts_us FROM (
        SELECT event_id, user_id, event_type, ts::TIMESTAMP AS ts_us,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts::TIMESTAMP, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def window_row_number_dedup(spark, sf_dir):
    """Keep-first dedup per (user, type) via row_number(); the batch twin
    of streaming dropDuplicates."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    return (
        e.select("event_id", "user_id", "event_type", "ts_us",
                 F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "window_lag_lead_delta",
    "window",
    oracle="""
    SELECT event_id, user_id,
           lag(event_id)  OVER w AS prev_event,
           lead(event_id) OVER w AS next_event,
           epoch_us(ts::TIMESTAMP)
             - lag(epoch_us(ts::TIMESTAMP)) OVER w AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)
    """,
)
def window_lag_lead_delta(spark, sf_dir):
    """lag/lead navigation + inter-event gap in exact integer µs."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    us = F.unix_micros(F.col("ts_us"))
    return e.select(
        "event_id",
        "user_id",
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        (us - F.lag(us).over(w)).alias("gap_us"),
    )


@query(
    "window_running_sum",
    "window frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark, sf_dir):
    """Cumulative per-customer spend (running-total frame)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 4).alias("running_spend"),
    )


@query(
    "window_moving_avg",
    "window frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT)
             AS mov_sum_cents,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS DOUBLE)
             / count(*) OVER w AS mov_avg_cents
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_avg(spark, sf_dir):
    """7-row sliding window.  Accumulates integer cents so the sliding
    sum is exact regardless of each engine's frame-accumulation order
    (SURVEY §7.3-H2); the single final division is deterministic."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    cents = F.floor(F.col("value") * 100).cast("long")
    mov_sum = F.sum(cents).over(w)
    return e.select(
        "event_id",
        "user_id",
        mov_sum.alias("mov_sum_cents"),
        (mov_sum.cast("double") / F.count("*").over(w)).alias("mov_avg_cents"),
    )


@query(
    "window_ntile_first_last",
    "window",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INT)
             AS quartile,
           first_value(c_acctbal) OVER seg AS seg_min_bal,
           last_value(c_acctbal)  OVER seg AS seg_max_bal
    FROM customer
    WINDOW seg AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_ntile_first_last(spark, sf_dir):
    """ntile + first/last_value with an explicit full-partition frame
    (last_value's default frame ends at CURRENT ROW — a classic trap).

    The global quartile (single-window form: ``F.ntile(4).over(
    Window.orderBy(...))``) is computed with the two-pass
    range-partitioned composition from ``operators/scale.py`` — bucket
    assignment is identical (test_ntile_from_row_number_matches_ntile)
    but no task ever sees the whole table, so the query survives a
    100× customer table.  The seg windows are partitioned and keep the
    ordinary one-shuffle window shape."""
    from ..operators.scale import ntile_from_row_number, ranged_row_number

    c = table(spark, sf_dir, "customer")
    cnt = c.agg(F.count("*").alias("__n"))
    base = (
        ranged_row_number(
            c.select("c_custkey", "c_mktsegment", "c_acctbal"),
            [F.asc("c_acctbal"), F.asc("c_custkey")],
            "__rn",
        )
        .crossJoin(F.broadcast(cnt))
        .withColumn(
            "quartile",
            ntile_from_row_number(F.col("__rn"), F.col("__n"), 4),
        )
    )
    seg = (
        Window.partitionBy("c_mktsegment")
        .orderBy("c_acctbal", "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return base.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        "quartile",
        F.first("c_acctbal").over(seg).alias("seg_min_bal"),
        F.last("c_acctbal").over(seg).alias("seg_max_bal"),
    )


@query(
    "sort_multi_key_nulls",
    "sort",
    oracle="""
    SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st, o_totalprice
    FROM orders
    ORDER BY st ASC NULLS FIRST, o_totalprice DESC, o_orderkey
    LIMIT 200
    """,
)
def sort_multi_key_nulls(spark, sf_dir):
    """Multi-key sort with pinned NULL placement (Spark's ASC default is
    NULLS FIRST, DuckDB's is NULLS LAST — must be explicit, §7.3-H4)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("st"),
            "o_totalprice",
        )
        .orderBy(
            F.col("st").asc_nulls_first(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(200)
    )


@query(
    "topk_global",
    "limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def topk_global(spark, sf_dir):
    """Global top-k; tie-broken on the unique key (§7.3-H7).  Spark plans
    TakeOrderedAndProject — no global sort materialized."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "window_count_distinct",
    "window",
    oracle="""
    SELECT user_id,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def window_count_distinct(spark, sf_dir):
    """COUNT(DISTINCT) OVER a window — an operator Spark does not
    support natively — composed from built-ins: dense_rank over
    (user, type) then max(rank) over the partition, the standard
    rewrite.  Both window passes share one shuffle + sort on
    ``user_id`` (Catalyst collapses same-partitioning windows); the
    oracle states the semantics directly as a grouped distinct
    count."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w_rank = Window.partitionBy("user_id").orderBy("event_type")
    w_all = Window.partitionBy("user_id")
    ranked = e.select(
        "user_id",
        F.dense_rank().over(w_rank).alias("dr"),
    ).select(
        "user_id",
        F.max("dr").over(w_all).alias("n_types"),
        F.count("*").over(w_all).alias("n_events"),
    )
    return ranked.distinct()
