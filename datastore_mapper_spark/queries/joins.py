"""Join contract queries (SURVEY §2.B #14–#22).

The reference never joins — Datastore has no join; joins happened in
BigQuery after export.  Here the full join surface is native, with the
physical strategy chosen for scale (SURVEY §4.3): explicit
``broadcast()`` for star-schema dims, sort-merge for fact-fact,
pre-filtered inputs for the nested-loop theta join, and an as-of join
rewritten to join+agg precisely to avoid a BNLJ blowup at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "join_broadcast_dim",
    "join",
    oracle="""
    SELECT p.p_brand, count(*) AS cnt, sum(l.l_quantity) AS sum_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size < 10
    GROUP BY p.p_brand
    """,
)
def join_broadcast_dim(spark, sf_dir):
    """Star join: fact x small dim, dim explicitly broadcast (no shuffle
    of the fact table on the join key)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("cnt"), F.sum("l_quantity").alias("sum_qty"))
    )


@query(
    "join_shuffle_large",
    "join",
    oracle="""
    SELECT o.o_orderstatus,
           count(*) AS cnt,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def join_shuffle_large(spark, sf_dir):
    """Large-large equi join (sort-merge at scale; AQE may downgrade to
    broadcast at test scale)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("cnt"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
    )


@query(
    "join_multiway_revenue",
    "join",
    oracle="""
    SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def join_multiway_revenue(spark, sf_dir):
    """TPC-H Q5-style 6-table join + aggregation (the flagship query).

    nation/region are broadcast; fact-side joins shuffle on their keys.
    """
    t = {n: table(spark, sf_dir, n) for n in
         ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@query(
    "join_left_outer",
    "join",
    oracle="""
    SELECT c.c_custkey,
           count(o.o_orderkey) AS order_cnt,
           round(sum(coalesce(o.o_totalprice, 0)), 4) AS total_spent
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 300000
    GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark, sf_dir):
    """Left outer join with a join-side predicate and null-side aggregation."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_totalprice > 300000),
            "left",
        )
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            F.round(F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0))), 4).alias(
                "total_spent"
            ),
        )
    )


@query(
    "join_full_outer",
    "join",
    oracle="""
    SELECT coalesce(n.n_nationkey, s.s_nationkey) AS natkey, n.n_name, s.s_name
    FROM nation n FULL OUTER JOIN supplier s ON n.n_nationkey = s.s_nationkey
    """,
)
def join_full_outer(spark, sf_dir):
    """Full outer join preserving both unmatched sides."""
    n = table(spark, sf_dir, "nation")
    s = table(spark, sf_dir, "supplier")
    return n.join(s, n.n_nationkey == s.s_nationkey, "full").select(
        F.coalesce(F.col("n_nationkey"), F.col("s_nationkey")).alias("natkey"),
        "n_name",
        "s_name",
    )


@query(
    "join_semi",
    "join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
)
def join_semi(spark, sf_dir):
    """Left semi join (IN-subquery shape): existence only, no fan-out."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    "join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    """,
)
def join_anti(spark, sf_dir):
    """Left anti join (NOT EXISTS shape)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_theta_range",
    "join",
    oracle="""
    SELECT o1.o_orderkey AS k1, o2.o_orderkey AS k2,
           o1.o_totalprice AS p1, o2.o_totalprice AS p2
    FROM orders o1 JOIN orders o2
      ON o1.o_orderkey < o2.o_orderkey
     AND o2.o_orderdate BETWEEN o1.o_orderdate
                            AND o1.o_orderdate + INTERVAL 1 DAY
    WHERE o1.o_totalprice > 480000 AND o2.o_totalprice > 480000
    """,
)
def join_theta_range(spark, sf_dir):
    """Non-equi band join, planned as a range-bucketed EQUI join.

    The band is ``d2 ∈ [d1, d1 + 1 day]``, so any matching pair shares
    a day bucket: ``day(d2) ∈ {day(d1), day(d1)+1}``.  The left side
    explodes into its two candidate buckets, the right side carries one
    bucket (``day(d2)``), and the join is an equi-join on the bucket
    followed by the exact band predicate — each qualifying pair matches
    exactly one bucket value, so no dedup is needed.  The plan is a
    hash/sort-merge join shuffled on the bucket (asserted in
    tests/test_plans.py: no BroadcastNestedLoopJoin), which is the
    shape that survives 100 TB; the former BNLJ formulation was O(n·m)
    the moment the price prefilter loosened.  The reusable general
    form is operators/scale.band_equi_join."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 480000)
    o1 = o.select(
        F.col("o_orderkey").alias("k1"),
        F.col("o_orderdate").alias("d1"),
        F.col("o_totalprice").alias("p1"),
    ).withColumn(
        "bucket",
        F.explode(
            F.array(
                F.date_trunc("day", "d1"),
                F.date_trunc("day", F.col("d1") + F.expr("INTERVAL 1 DAY")),
            )
        ),
    )
    o2 = o.select(
        F.col("o_orderkey").alias("k2"),
        F.col("o_orderdate").alias("d2"),
        F.col("o_totalprice").alias("p2"),
        F.date_trunc("day", "o_orderdate").alias("bucket"),
    )
    return (
        o1.join(o2, "bucket")
        .filter(
            (F.col("k1") < F.col("k2"))
            & (F.col("d2") >= F.col("d1"))
            & (F.col("d2") <= F.col("d1") + F.expr("INTERVAL 1 DAY"))
        )
        .select("k1", "k2", "p1", "p2")
    )


@query(
    "join_asof_nearest",
    "join",
    oracle="""
    SELECT e.event_id, e.user_id,
           max(o.o_orderdate) AS last_order_ts,
           CAST(count(*) AS BIGINT) AS n_candidates
    FROM events e JOIN orders o
      ON o.o_custkey = e.user_id
     AND o.o_orderdate <= date_trunc('day', e.ts::TIMESTAMP)
    GROUP BY e.event_id, e.user_id
    """,
)
def join_asof_nearest(spark, sf_dir):
    """As-of join: latest order at-or-before each event's day, per key.

    Expressed as equi-join + max-aggregate (identical semantics on both
    engines); at scale this is a shuffle on the key followed by a
    partial/final max — no nested loop, no sort of the big side."""
    e = table(spark, sf_dir, "events")
    o = table(spark, sf_dir, "orders")
    return (
        e.select("event_id", "user_id", F.date_trunc("day", "ts_us").alias("day"))
        .join(
            o,
            (o.o_custkey == F.col("user_id")) & (o.o_orderdate <= F.col("day")),
        )
        .groupBy("event_id", "user_id")
        .agg(
            F.max("o_orderdate").alias("last_order_ts"),
            F.count("*").alias("n_candidates"),
        )
    )


@query(
    "join_interval_overlap",
    "join",
    oracle="""
    WITH l AS (
        SELECT o_orderkey AS k1,
               date_trunc('day', o_orderdate) AS s1,
               date_trunc('day', o_orderdate)
                 + INTERVAL 1 DAY * CAST(o_orderkey % 3 AS INT) AS e1
        FROM orders
        WHERE o_totalprice > 480000 AND o_custkey % 2 = 0
    ), r AS (
        SELECT o_orderkey AS k2,
               date_trunc('day', o_orderdate) AS s2,
               date_trunc('day', o_orderdate)
                 + INTERVAL 1 DAY * CAST(o_orderkey % 4 AS INT) AS e2
        FROM orders
        WHERE o_totalprice > 480000 AND o_custkey % 2 = 1
    )
    SELECT k1, k2,
           CAST(date_diff('day', greatest(s1, s2), least(e1, e2)) + 1
                AS INT) AS ov_days
    FROM l JOIN r ON s1 <= e2 AND s2 <= e1
    """,
)
def join_interval_overlap(spark, sf_dir):
    """Two-sided INTERVAL OVERLAP join — both inputs are [start, end]
    spans (day-granular order validity windows derived from the
    fixture) and a pair qualifies iff the spans intersect.  Distinct
    from ``join_theta_range`` (point-in-band): here BOTH sides have
    variable-length extents, the shape of session-vs-outage overlap,
    ad-exposure attribution, and validity-interval reconciliation.

    Scale shape: each interval replicates to its covered day buckets
    (``sequence`` + explode — replication factor = interval length in
    days, bounded here at 4); the join is an EQUI join shuffled on the
    bucket, never a BroadcastNestedLoopJoin.  An overlapping pair
    would match once per shared bucket, so instead of a post-join
    ``distinct`` (a second full shuffle of the pair stream) each pair
    is emitted only in its RESPONSIBILITY bucket —
    ``greatest(s1, s2)``, the first shared day, which both intervals
    provably cover — making the bucket join exactly-once by
    construction.  At 100 TB the bucket granularity is chosen ~median
    interval length so replication stays O(1) per row."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 480000)
    s = F.date_trunc("day", F.col("o_orderdate"))

    def spans(df, parity, mod, k, s_name, e_name):
        return (
            df.filter(F.col("o_custkey") % 2 == parity)
            .select(
                F.col("o_orderkey").alias(k),
                s.alias(s_name),
                (
                    s
                    + F.expr("INTERVAL 1 DAY")
                    * (F.col("o_orderkey") % mod).cast("int")
                ).alias(e_name),
            )
        )

    from ..operators.scale import interval_overlap_join

    lhs = spans(o, 0, 3, "k1", "s1", "e1")
    rhs = spans(o, 1, 4, "k2", "s2", "e2")
    return interval_overlap_join(lhs, rhs).select(
        "k1",
        "k2",
        (
            F.datediff(F.least("e1", "e2"), F.greatest("s1", "s2")) + 1
        ).cast("int").alias("ov_days"),
    )
