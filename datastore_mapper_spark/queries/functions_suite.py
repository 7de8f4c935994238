"""Scalar-function contract queries (SURVEY §2.B #35–#42): string,
date, math, conditional, array, explode, JSON, array-agg.

These map to the reference's per-entity map callback surface (the
user-supplied ``Next(ctx, w, key)`` transform, SURVEY §2.A A5) — but
expressed as built-in JVM expressions inside whole-stage codegen, not
per-row Python.  Dialect notes from SURVEY §7.3-H5/H6 apply throughout
(DuckDB length/year/ceil return wider types — oracle casts; dow
numbering normalized to ISO; ratios cast to DOUBLE).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "fn_string_suite",
    "scalar fn",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up_name,
           lower(p_type) AS lo_type,
           substr(p_name, 1, 8) AS name8,
           CAST(length(p_name) AS INT) AS name_len,
           trim('  ' || p_name || ' ') AS trimmed,
           concat(p_brand, '/', p_type) AS brand_type,
           replace(p_name, ' ', '_') AS und_name,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num
    FROM part
    WHERE p_name LIKE '%e%'
    """,
)
def fn_string_suite(spark, sf_dir):
    """upper/lower/substr/trim/concat/length/replace/regexp_extract/LIKE."""
    p = table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%e%")).select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_type").alias("lo_type"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.length("p_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("und_name"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
    )


@query(
    "fn_date_suite",
    "scalar fn",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(isodow(o_orderdate) AS INT) AS iso_dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', o_orderdate::DATE, DATE '2000-01-01') AS INT)
             AS days_to_2000,
           o_orderdate + INTERVAL 30 DAY AS plus_30d
    FROM orders
    """,
)
def fn_date_suite(spark, sf_dir):
    """extract/trunc/diff/interval arithmetic; day-of-week normalized to
    ISO numbering (Spark Sunday=1 vs DuckDB dow Sunday=0, §7.3-H6)."""
    o = table(spark, sf_dir, "orders")
    iso_dow = ((F.dayofweek("o_orderdate") + 5) % 7) + 1
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.quarter("o_orderdate").alias("qtr"),
        iso_dow.cast("int").alias("iso_dow"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.to_date("o_orderdate")).alias(
            "days_to_2000"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("plus_30d"),
    )


@query(
    "fn_math_suite",
    "scalar fn",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS r1,
           abs(l_discount - 0.05) AS ab,
           CAST(ceil(l_quantity) AS BIGINT) AS ce,
           CAST(floor(l_quantity) AS BIGINT) AS fl,
           l_linenumber % 3 AS md,
           round(pow(l_quantity, 2.0), 6) AS pw,
           round(sqrt(l_extendedprice), 6) AS sq,
           round(ln(l_extendedprice), 6) AS lg,
           round(exp(l_discount), 6) AS ex
    FROM lineitem
    """,
)
def fn_math_suite(spark, sf_dir):
    """round/abs/ceil/floor/mod/pow/sqrt/ln/exp.  Transcendentals are
    rounded to 6 dp — JVM vs C libm may differ in the final ulp."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("r1"),
        F.abs(F.col("l_discount") - 0.05).alias("ab"),
        F.ceil("l_quantity").alias("ce"),
        F.floor("l_quantity").alias("fl"),
        (F.col("l_linenumber") % 3).alias("md"),
        F.round(F.pow("l_quantity", F.lit(2.0)), 6).alias("pw"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sq"),
        F.round(F.log("l_extendedprice"), 6).alias("lg"),
        F.round(F.exp("l_discount"), 6).alias("ex"),
    )


@query(
    "fn_conditional",
    "scalar fn",
    oracle="""
    SELECT s_suppkey,
           coalesce(nullif(s_name, ''), 'unknown') AS name_nz,
           nullif(s_nationkey, 0) AS natkey_nz,
           greatest(s_acctbal, 0.0) AS bal_floor,
           least(s_acctbal, 5000.0) AS bal_cap
    FROM supplier
    """,
)
def fn_conditional(spark, sf_dir):
    """coalesce/nullif/greatest/least."""
    s = table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.coalesce(F.nullif(F.col("s_name"), F.lit("")), F.lit("unknown")).alias(
            "name_nz"
        ),
        F.nullif(F.col("s_nationkey"), F.lit(0)).alias("natkey_nz"),
        F.greatest(F.col("s_acctbal"), F.lit(0.0)).alias("bal_floor"),
        F.least(F.col("s_acctbal"), F.lit(5000.0)).alias("bal_cap"),
    )


@query(
    "fn_array_suite",
    "array fn",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           embedding[1] AS first_val,
           embedding[64] AS last_val,
           list_sort(embedding)[1] AS min_val,
           list_sort(embedding)[64] AS max_val
    FROM embeddings
    """,
)
def fn_array_suite(spark, sf_dir):
    """size / element access (1-based both engines) / sort_array over the
    float32 embedding column."""
    e = table(spark, sf_dir, "embeddings")
    srt = F.sort_array("embedding")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        F.element_at("embedding", 64).alias("last_val"),
        F.element_at(srt, 1).alias("min_val"),
        F.element_at(srt, 64).alias("max_val"),
    )


@query(
    "fn_explode_unnest",
    "array/table fn",
    oracle="""
    SELECT tok AS term, count(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    ORDER BY cnt DESC, term
    LIMIT 20
    """,
)
def fn_explode_unnest(spark, sf_dir):
    """explode(split()) — the UDTF-shaped builtin; word-count top 20."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("term"))
        .limit(20)
    )


@query(
    "fn_json_extract",
    "json fn",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS BIGINT) AS sum_k,
           avg(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def fn_json_extract(spark, sf_dir):
    """Schema-on-read over the embedded-entity JSON column (the
    reference's nested-entity analogue, SURVEY §1.2)."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.avg(k).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "agg_collect_sorted",
    "array agg",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ', ') AS nations,
           count(*) AS cnt
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_collect_sorted(spark, sf_dir):
    """Per-group sorted list, joined to a string (DuckDB 1.0 rejects
    ORDER BY inside aggregate args — §7.3-H6 formulation)."""
    n = table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(", ", F.sort_array(F.collect_list("n_name"))).alias("nations"),
        F.count("*").alias("cnt"),
    )
