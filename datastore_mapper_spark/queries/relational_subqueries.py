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


@query(
    "attribution_first_touch",
    "analytics",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, ts::TIMESTAMP AS ts_us, event_id
        FROM events
    ), firsts AS (
        SELECT user_id, event_type AS first_touch,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id) AS rnk
        FROM e
    ), conv AS (
        SELECT user_id, count(*) AS n_purchases
        FROM e WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT f.first_touch,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(COALESCE(c.n_purchases, 0)) AS BIGINT)
               AS attributed_purchases
    FROM firsts f LEFT JOIN conv c ON f.user_id = c.user_id
    WHERE f.rnk = 1
    GROUP BY f.first_touch
    """,
)
def attribution_first_touch(spark, sf_dir):
    """First-touch attribution: every user's purchases credit the
    event type that FIRST brought them in (row_number over event time,
    ties broken on event_id) — the window-plus-join shape of marketing
    attribution.  One window shuffle on user plus one aggregate; at
    100 TB the firsts table is |users|-sized, broadcastable against
    the conversion aggregate."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    firsts = (
        e.select(
            "user_id",
            F.col("event_type").alias("first_touch"),
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") == 1)
    )
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_purchases"))
    )
    return (
        firsts.join(conv, "user_id", "left")
        .groupBy("first_touch")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.coalesce(F.col("n_purchases"), F.lit(0)))
            .alias("attributed_purchases"),
        )
    )


@query(
    "cdc_last_write_wins",
    "analytics/etl",
    oracle="""
    WITH updates AS (
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(38,3))
                   AS price, 0 AS version
        FROM orders
        UNION ALL
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2))
                    * CAST(1.1 AS DECIMAL(2,1)) AS DECIMAL(38,3)), 1
        FROM orders WHERE o_orderkey % 10 = 3
        UNION ALL
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2))
                    * CAST(1.2 AS DECIMAL(2,1)) AS DECIMAL(38,3)), 2
        FROM orders WHERE o_orderkey % 100 = 3
    ), latest AS (
        SELECT o_orderkey, price,
               row_number() OVER (PARTITION BY o_orderkey
                                  ORDER BY version DESC) AS rnk
        FROM updates
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(CAST(sum(price) AS DECIMAL(38,3)) AS DOUBLE)
               AS total_after_merge
    FROM latest WHERE rnk = 1
    """,
)
def cdc_last_write_wins(spark, sf_dir):
    """Change-data-capture merge, last-write-wins: a base snapshot plus
    two deterministic update waves collapse to the highest version per
    key (row_number over version DESC) — the upsert/merge shape every
    CDC-fed lakehouse table needs, expressed engine-agnostically.  At
    100 TB this runs per micro-batch in foreachBatch against a keyed
    table; the window shuffles once on the merge key.

    Update waves multiply in DECIMAL, never round a double:
    round(double*1.1, 2) tie-breaks differently across engines
    (HALF_UP vs rint) and diverged at sf0.1 — decimal products are
    exact so no rounding exists to disagree about."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    price2 = F.col("o_totalprice").cast("decimal(18,2)")

    def wave(pred, factor: str, version: int):
        src = o.filter(pred) if pred is not None else o
        p = (
            price2
            if factor is None
            else price2 * F.lit(factor).cast("decimal(2,1)")
        )
        return src.select(
            "o_orderkey",
            p.cast("decimal(38,3)").alias("price"),
            F.lit(version).alias("version"),
        )

    updates = (
        wave(None, None, 0)
        .union(wave(F.col("o_orderkey") % 10 == 3, "1.1", 1))
        .union(wave(F.col("o_orderkey") % 100 == 3, "1.2", 2))
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("version"))
    latest = updates.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") == 1
    )
    return latest.agg(
        F.count("*").alias("n_keys"),
        F.sum("price").cast("decimal(38,3)").cast("double")
        .alias("total_after_merge"),
    )


@query(
    "scd2_validity_intervals",
    "analytics/etl",
    oracle="""
    WITH seq AS (
        SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
               lead(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey)
                   AS valid_to
        FROM orders
    )
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_versions,
           CAST(count(*) FILTER (WHERE valid_to IS NULL) AS BIGINT)
               AS n_current,
           CAST(sum(CASE WHEN valid_to IS NOT NULL
                         THEN date_diff('day', valid_from::TIMESTAMP,
                                        valid_to::TIMESTAMP)
                         ELSE 0 END) AS BIGINT) AS covered_days
    FROM seq
    GROUP BY o_custkey
    HAVING count(*) > 20
    """,
)
def scd2_validity_intervals(spark, sf_dir):
    """SCD-type-2 interval construction: each record's validity runs
    from its own timestamp to its successor's (lead over the business
    key), the open interval marking the current version — the
    slowly-changing-dimension build every warehouse ETL performs.  One
    window shuffle on the business key; interval arithmetic checked
    per customer (versions, current rows, covered days)."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
    )
    return (
        seq.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_versions"),
            F.count(F.when(F.col("valid_to").isNull(), 1)).alias("n_current"),
            F.sum(
                F.when(
                    F.col("valid_to").isNotNull(),
                    F.datediff(F.col("valid_to"), F.col("valid_from")),
                ).otherwise(0)
            ).alias("covered_days"),
        )
        .filter(F.col("n_versions") > 20)
    )
