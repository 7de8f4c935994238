"""Fourth extension suite: regexp_extract_all, printf-style formatting,
IGNORE NULLS window navigation, map type construction/access.

Probed MATCH this session. Traps found and routed around:

- DuckDB list slice of an EMPTY list yields NULL (Spark ``slice`` gives
  an empty array) — oracle wraps ``coalesce(..., '')``;
- DuckDB ``map[key]`` returns a one-element LIST — index ``[1]`` to get
  the scalar Spark returns.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "fn_regexp_extract_all",
    "scalar fn",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, 'w[a-z]+')) AS INT) AS n_w,
           coalesce(array_to_string(
               regexp_extract_all(text, 'w[a-z]+')[1:3], ','), '') AS first3
    FROM documents
    WHERE doc_id < 2000
    """,
)
def fn_regexp_extract_all(spark, sf_dir):
    """All-matches regex extraction into an array + slice/join —
    POSIX-simple pattern so RE2/Java flavors agree (§7.3-H6)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    matches = F.regexp_extract_all("text", F.lit("w[a-z]+"), 0)
    return d.select(
        "doc_id",
        F.size(matches).alias("n_w"),
        F.array_join(F.slice(matches, 1, 3), ",").alias("first3"),
    )


@query(
    "fn_format_string",
    "scalar fn",
    oracle="""
    SELECT o_orderkey,
           printf('%s|%07d|%.2f', o_orderstatus, o_orderkey, o_totalprice)
               AS s
    FROM orders
    WHERE o_orderkey < 10000
    """,
)
def fn_format_string(spark, sf_dir):
    """printf-style formatting (zero-pad, fixed decimals) — the record
    serialization used by text sinks; ``format_string`` ≙ ``printf``."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 10000)
    return o.select(
        "o_orderkey",
        F.format_string(
            "%s|%07d|%.2f", "o_orderstatus", "o_orderkey", "o_totalprice"
        ).alias("s"),
    )


@query(
    "window_ignore_nulls",
    "window",
    oracle="""
    SELECT o_orderkey,
           last_value(nullif(o_orderstatus, 'O') IGNORE NULLS) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_nonopen
    FROM orders
    """,
)
def window_ignore_nulls(spark, sf_dir):
    """IGNORE NULLS navigation — last non-NULL value seen so far per
    partition (the gap-fill / last-observation-carried-forward
    primitive).  Note the dialect seam: Spark puts IGNORE NULLS after
    the call, DuckDB inside the argument list."""
    table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               last_value(nullif(o_orderstatus, 'O')) IGNORE NULLS OVER (
                   PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_nonopen
        FROM orders
        """
    )


@query(
    "fn_map_type",
    "map fn",
    oracle="""
    SELECT n_name,
           map(['key', 'region'],
               [CAST(n_nationkey AS VARCHAR), CAST(n_regionkey AS VARCHAR)]
           )['region'][1] AS r,
           2 AS n_keys
    FROM nation
    """,
)
def fn_map_type(spark, sf_dir):
    """MapType construction + key access (the Datastore property-bag
    shape, §1.1).  DuckDB map access returns a 1-element list — oracle
    indexes ``[1]``; ``size(map)`` ≙ literal key count here."""
    n = table(spark, sf_dir, "nation")
    m = F.map_from_arrays(
        F.array(F.lit("key"), F.lit("region")),
        F.array(
            F.col("n_nationkey").cast("string"),
            F.col("n_regionkey").cast("string"),
        ),
    )
    return n.select(
        "n_name",
        m.getItem("region").alias("r"),
        F.size(m).alias("n_keys"),
    )
