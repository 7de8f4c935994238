"""Sixth extension suite: nth_value/dense_rank windows, expression
rollups over the time hierarchy, distinct ordered collect, cross-modal
document↔embedding join, NULL-semantics aggregates.

All probed MATCH this session (Spark 4.1.2 vs DuckDB 1.0.0).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "window_nth_dense",
    "window",
    oracle="""
    SELECT o_orderkey, dense_rank() OVER w AS dr,
           nth_value(o_orderkey, 2) OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS second_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_nth_dense(spark, sf_dir):
    """dense_rank + nth_value with a full-partition frame (each
    customer's second-priciest order key on every row) — nth_value
    needs the explicit UNBOUNDED FOLLOWING frame or rows before
    position n see NULL."""
    table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, dense_rank() OVER w AS dr,
               nth_value(o_orderkey, 2) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS second_key
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey)
        """
    )


@query(
    "agg_time_rollup",
    "grouping sets",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS y,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(month(o_orderdate) AS INT) AS m,
           count(*) AS cnt,
           CAST(grouping(year(o_orderdate)) AS INT) AS gy,
           CAST(grouping(month(o_orderdate)) AS INT) AS gm
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), quarter(o_orderdate),
                     month(o_orderdate))
    """,
)
def agg_time_rollup(spark, sf_dir):
    """ROLLUP over derived time-hierarchy EXPRESSIONS (year→quarter→
    month) with grouping() markers — the calendar drill-down cube;
    complements the plain-column rollup #10."""
    table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT CAST(year(o_orderdate) AS INT) AS y,
               CAST(quarter(o_orderdate) AS INT) AS q,
               CAST(month(o_orderdate) AS INT) AS m,
               count(*) AS cnt,
               CAST(grouping(year(o_orderdate)) AS INT) AS gy,
               CAST(grouping(month(o_orderdate)) AS INT) AS gm
        FROM orders
        GROUP BY ROLLUP (year(o_orderdate), quarter(o_orderdate),
                         month(o_orderdate))
        """
    )


@query(
    "agg_collect_distinct_sorted",
    "array agg",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list_distinct(
               list(substring(n_name, 1, 8)))), ',') AS names
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_collect_distinct_sorted(spark, sf_dir):
    """Distinct ordered list aggregation compared as a joined string
    (#42's discipline: DuckDB 1.0 rejects ORDER BY inside aggregate
    args, so sorting happens post-hoc on both sides)."""
    n = table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(
            ",",
            F.sort_array(F.array_distinct(
                F.collect_list(F.substring("n_name", 1, 8))))
        ).alias("names")
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
    "agg_null_semantics",
    "aggregation",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_rows,
           CAST(count(nullif(o_orderstatus, 'O')) AS BIGINT) AS n_nonopen,
           round(avg(CASE WHEN o_orderstatus <> 'O'
                          THEN o_totalprice END), 4) AS avg_nonopen_price,
           CAST(min(nullif(o_orderstatus, 'O')) IS NULL AS BOOLEAN)
               AS all_null_group
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_null_semantics(spark, sf_dir):
    """NULL aggregation semantics pinned down: count(col) skips NULLs,
    avg ignores NULLs (not zero-fills), min of an all-NULL group is
    NULL — identical in both engines, asserted per group."""
    o = table(spark, sf_dir, "orders")
    nonopen = F.nullif("o_orderstatus", F.lit("O"))
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_rows"),
        F.count(nonopen).alias("n_nonopen"),
        F.round(
            F.avg(F.when(F.col("o_orderstatus") != "O",
                         F.col("o_totalprice"))), 4
        ).alias("avg_nonopen_price"),
        F.min(nonopen).isNull().alias("all_null_group"),
    )


@query(
    "fn_string_extra",
    "scalar fn",
    oracle="""
    SELECT p_partkey,
           lpad(p_brand, 12, '*') AS lp,
           rpad(p_type, 10, '.') AS rp,
           reverse(p_name) AS rev,
           translate(p_name, 'aeiou', '_____') AS tr,
           repeat(left(p_brand, 2), 3) AS rep,
           CAST(instr(p_name, 'e') AS INT) AS pos_e
    FROM part
    WHERE p_partkey < 2000
    """,
)
def fn_string_extra(spark, sf_dir):
    """Second string-function sweep: pad/reverse/translate/repeat/
    instr (1-based find, 0 = absent) — identical names and semantics
    in both engines (DuckDB 1.0 lacks only initcap, which is omitted)."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 2000)
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("lp"),
        F.rpad("p_type", 10, ".").alias("rp"),
        F.reverse("p_name").alias("rev"),
        F.translate("p_name", "aeiou", "_____").alias("tr"),
        F.repeat(F.substring("p_brand", 1, 2), 3).alias("rep"),
        F.instr("p_name", "e").alias("pos_e"),
    )
