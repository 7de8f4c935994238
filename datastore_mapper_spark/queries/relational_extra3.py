"""Third relational-extension suite: bag-semantics set ops, FILTER
clause aggregates, extended date functions, null-safe equality join,
positional explode, typed JSON struct extraction.

All dialect pairs probed MATCH (Spark 4.1.2 vs DuckDB 1.0.0) this
session before declaration. Notes record the trap each oracle routes
around:

- ``add_months``: DuckDB's ``+ INTERVAL`` yields TIMESTAMP — cast back
  to DATE;
- ``months_between``: no DuckDB builtin; the oracle inlines Spark's
  documented formula (month delta + day delta / 31) — valid here
  because neither side of the comparison is a month's last day;
- posexplode: DuckDB lacks ``WITH ORDINALITY`` — ordinal synthesized
  with ``generate_series(1, len(list))`` + 1-based list indexing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


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
    "agg_filter_clause",
    "aggregation",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           round(sum(o_totalprice) FILTER (WHERE o_totalprice > 150000),
                 4) AS big_total
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_filter_clause(spark, sf_dir):
    """Per-aggregate FILTER clauses — several differently-filtered
    aggregates in ONE pass over the data (no self-join, no union)."""
    table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
               round(sum(o_totalprice) FILTER (WHERE o_totalprice > 150000),
                     4) AS big_total
        FROM orders
        GROUP BY o_orderpriority
        """
    )


@query(
    "fn_date_extra",
    "scalar fn",
    oracle="""
    SELECT o_orderkey,
           last_day(o_orderdate) AS ld,
           CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS am,
           round((1998 - year(o_orderdate)) * 12
                 + (1 - month(o_orderdate))
                 + (1 - day(o_orderdate)) / 31.0, 4) AS mb
    FROM orders
    WHERE o_orderkey < 10000
    """,
)
def fn_date_extra(spark, sf_dir):
    """Extended date functions: last_day, add_months, months_between
    (oracle inlines Spark's documented 31-day-fraction formula)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 10000)
    return o.select(
        "o_orderkey",
        F.last_day("o_orderdate").alias("ld"),
        F.add_months("o_orderdate", 2).alias("am"),
        F.round(F.months_between(F.lit("1998-01-01").cast("date"),
                                 F.col("o_orderdate")), 4).alias("mb"),
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
    "fn_posexplode_ordinal",
    "array/table fn",
    oracle="""
    SELECT doc_id, CAST(g.i - 1 AS INT) AS pos, toks[g.i] AS tok
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id < 100),
         LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) g
    """,
)
def fn_posexplode_ordinal(spark, sf_dir):
    """Positional explode (token + 0-based ordinal) — the ordered form
    of #40's explode; the position column is what n-gram/shingle
    construction windows over."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )


@query(
    "fn_from_json_struct",
    "json fn",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k
    FROM events
    WHERE event_id < 2000
    """,
)
def fn_from_json_struct(spark, sf_dir):
    """Schema-full JSON parsing (``from_json`` to a typed struct, field
    access) vs #41's schemaless ``get_json_object`` path."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return e.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("k"),
    )
