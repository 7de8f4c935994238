"""Extended relational coverage beyond the base SURVEY §2.B rows:
pivot, statistical aggregates, bitwise ops, cryptographic hashes,
regexp suite, correlated scalar subquery, distribution windows,
min_by/max_by.  Same oracle discipline as everywhere else.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "agg_pivot",
    "aggregation",
    oracle="""
    SELECT o_orderpriority,
           count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS cnt_f,
           count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS cnt_o,
           count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS cnt_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_pivot(spark, sf_dir):
    """Pivot status values into columns (BigQuery-class reshaping)."""
    o = table(spark, sf_dir, "orders")
    pv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("cnt_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("cnt_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("cnt_p"),
    )


@query(
    "agg_stats_suite",
    "aggregation",
    oracle="""
    SELECT l_returnflag,
           count(*) AS cnt,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats_suite(spark, sf_dir):
    """Statistical aggregates (stddev/corr/covar), rounded — the two
    engines use different variance algorithms (§7.3-H2)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("cnt"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cov_qty_disc"),
    )


@query(
    "fn_bitwise_suite",
    "scalar fn",
    oracle="""
    SELECT event_id,
           user_id & 255 AS band,
           user_id | 1024 AS ored,
           xor(user_id, event_id) AS xored,
           user_id << 2 AS shl,
           event_id >> 3 AS shr,
           CAST(bit_count(event_id) AS INT) AS popcnt
    FROM events
    """,
)
def fn_bitwise_suite(spark, sf_dir):
    """Bitwise AND/OR/XOR/shifts/popcount on 64-bit keys."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.expr("user_id & 255").alias("band"),
        F.expr("user_id | 1024").alias("ored"),
        F.expr("user_id ^ event_id").alias("xored"),
        F.expr("user_id << 2").alias("shl"),
        F.expr("event_id >> 3").alias("shr"),
        F.bit_count("event_id").alias("popcnt"),
    )


@query(
    "fn_hash_suite",
    "scalar fn",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha256(text) AS sha256_hex
    FROM documents
    """,
)
def fn_hash_suite(spark, sf_dir):
    """Cryptographic digests — standard algorithms, so they cross-check
    between engines (unlike engine hash functions such as xxhash64).
    At scale: dedup shuffles move the 16/32-byte digest, not the text."""
    d = table(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.md5(blob).alias("md5_hex"),
        F.sha2(blob, 256).alias("sha256_hex"),
    )


@query(
    "fn_regexp_suite",
    "scalar fn",
    oracle="""
    SELECT p_partkey,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred,
           CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS INT) AS n_words
    FROM part
    WHERE regexp_matches(p_name, 'widget|gear')
    """,
)
def fn_regexp_suite(spark, sf_dir):
    """regexp_replace / rlike filter / extract_all counting (POSIX-simple
    patterns only — §7.3-H6 flavor caution)."""
    p = table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").rlike("widget|gear")).select(
        "p_partkey",
        F.regexp_replace("p_name", "[aeiou]", "*").alias("starred"),
        F.size(F.regexp_extract_all("p_name", F.lit("[a-z]+"), 0)).alias("n_words"),
    )


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
    "window_cume_percent",
    "window",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_cume_percent(spark, sf_dir):
    """Distribution window functions — exact rank-ratio arithmetic, so
    no rounding is needed."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "agg_min_max_by",
    "aggregation",
    oracle="""
    SELECT o_custkey,
           max_by(o_orderkey, o_totalprice) AS biggest_order,
           min_by(o_orderkey, o_totalprice) AS smallest_order,
           max(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_custkey
    """,
)
def agg_min_max_by(spark, sf_dir):
    """max_by/min_by (argmax aggregates).  Deterministic because
    o_totalprice values are unique within a customer in the fixtures."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
    )
