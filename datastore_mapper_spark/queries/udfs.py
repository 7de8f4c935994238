"""UDF-surface contract queries (SURVEY §2.B #52–#54).

This is the engine's escape hatch for the reference's arbitrary
per-entity map callback (``Next(ctx, w, key)``, SURVEY §2.A A5) when
the logic genuinely can't be a built-in expression:

- #52: row-at-a-time Python UDF — the slow path, kept tiny on purpose;
- #53: Arrow-vectorized pandas UDF — the right Python hot path
  (~10-100x the row UDF);
- #54: ``applyInPandas`` — grouped-map, the general UDAF/flatMap
  escape hatch (also how custom stateful ops are built);
- ``cogroup().applyInPandas`` — cogrouped-map (two keyed frames meet
  per key; the pd.merge_asof as-of join);
- ``mapInArrow`` — raw RecordBatches, zero pandas conversion.

Oracles inline the same arithmetic in SQL (DuckDB ASOF JOIN for the
cogrouped as-of).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..catalog import table
from ..registry import query


@query(
    "udf_python_scalar",
    "UDF",
    oracle="""
    SELECT o_orderkey,
           CAST(CASE WHEN o_totalprice < 100000 THEN 0.1
                     WHEN o_totalprice < 200000 THEN 0.18
                     ELSE 0.25 END AS DOUBLE) AS rate,
           o_totalprice * CAST(CASE WHEN o_totalprice < 100000 THEN 0.1
                                    WHEN o_totalprice < 200000 THEN 0.18
                                    ELSE 0.25 END AS DOUBLE) AS tax
    FROM orders
    """,
)
def udf_python_scalar(spark, sf_dir):
    """Row-at-a-time Python UDF (tax bracket)."""
    o = table(spark, sf_dir, "orders")

    @F.udf(returnType=DoubleType())
    def bracket(price: float) -> float:
        if price < 100000:
            return 0.1
        if price < 200000:
            return 0.18
        return 0.25

    rate = bracket("o_totalprice")
    return o.select(
        "o_orderkey",
        rate.alias("rate"),
        (F.col("o_totalprice") * rate).alias("tax"),
    )


@query(
    "udf_pandas_vectorized",
    "UDF",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS discounted
    FROM lineitem
    """,
)
def udf_pandas_vectorized(spark, sf_dir):
    """Arrow-batched pandas UDF computing the same per-row arithmetic."""
    li = table(spark, sf_dir, "lineitem")

    @F.pandas_udf(DoubleType())
    def discounted(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    return li.select(
        "l_orderkey",
        "l_linenumber",
        discounted("l_extendedprice", "l_discount").alias("discounted"),
    )


@query(
    "udaf_grouped_pandas",
    "UDAF",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round((c_acctbal - avg(c_acctbal) OVER seg)
                 / stddev_samp(c_acctbal) OVER seg, 6) AS z_acctbal
    FROM customer
    WINDOW seg AS (PARTITION BY c_mktsegment)
    """,
)
def udaf_grouped_pandas(spark, sf_dir):
    """Grouped-map applyInPandas: per-segment z-score normalization.
    Rounded to 6 dp — numpy's pairwise mean/std vs the oracle's
    streaming variance differ in the last ulp (SURVEY §7.3-H2)."""
    c = table(spark, sf_dir, "customer")
    schema = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_mktsegment", StringType()),
            StructField("z_acctbal", DoubleType()),
        ]
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        bal = pdf["c_acctbal"]
        z = (bal - bal.mean()) / bal.std(ddof=1)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "z_acctbal": z.round(6),
            }
        )

    return c.groupBy("c_mktsegment").applyInPandas(zscore, schema)


@query(
    "cogroup_asof_pandas",
    "UDF",
    oracle="""
    SELECT e.event_id, e.user_id, o.o_orderdate AS last_order_ts
    FROM (SELECT event_id, user_id, ts::TIMESTAMP AS ts_us
          FROM events WHERE user_id < 200) e
    ASOF LEFT JOIN orders o
      ON e.user_id = o.o_custkey AND e.ts_us >= o.o_orderdate
    """,
)
def cogroup_asof_pandas(spark, sf_dir):
    """CoGrouped-map UDF (``groupBy().cogroup().applyInPandas``) — the
    fourth Python escape hatch after scalar/pandas/grouped-map (#52-54):
    both sides shuffle on the key, then each key's two pandas frames
    meet in one Python call.  The canonical use is the as-of join via
    ``pd.merge_asof`` (latest order at-or-before each event), which the
    DuckDB oracle replays with a native ASOF LEFT JOIN.  Events with no
    prior order surface as NULL (left semantics).  At 100 TB this is
    one co-partitioned shuffle per side — same wire cost as the
    equi-join formulation (#22) — with python work per GROUP; the
    production discipline (round-9, after the r8 sweep measured 38 s
    here) is therefore to cogroup on a BUCKET of keys, not the raw
    key: one ``merge_asof(by='user_id')`` call handles every key in
    the bucket, so the per-call Python/Arrow overhead is paid
    |buckets| times instead of |keys| times (and never for the
    right-only keys the unfiltered r8 form paid empty calls for —
    the right side is now pre-filtered to the left's key range).
    Prefer #22's built-in form unless the per-group logic genuinely
    needs pandas."""
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 200)
        .select("event_id", "user_id", "ts_us")
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)  # match the left key range
        .select(F.col("o_custkey").alias("user_id"), "o_orderdate")
    )
    out_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("last_order_ts", TimestampType()),
        ]
    )

    def asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame(
                {"event_id": [], "user_id": [], "last_order_ts": []}
            ).astype(
                {"event_id": "int64", "user_id": "int64",
                 "last_order_ts": "datetime64[us]"}
            )
        # merge_asof(by=) needs time-sorted frames; 'by' pairs the
        # keys inside the bucket
        left = left.sort_values("ts_us")
        right = right.sort_values("o_orderdate")
        merged = pd.merge_asof(
            left,
            right[["user_id", "o_orderdate"]],
            left_on="ts_us",
            right_on="o_orderdate",
            by="user_id",
            direction="backward",
        )
        return pd.DataFrame(
            {
                "event_id": merged["event_id"],
                "user_id": merged["user_id"],
                "last_order_ts": merged["o_orderdate"],
            }
        )

    bucket = (F.col("user_id") % 32).alias("bk")
    return (
        e.groupBy(bucket)
        .cogroup(o.groupBy(bucket))
        .applyInPandas(asof, out_schema)
    )


@query(
    "maparrow_byte_stats",
    "UDF",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
           CAST(max(strlen(text)) AS BIGINT) AS max_bytes
    FROM documents
    GROUP BY lang
    """,
)
def maparrow_byte_stats(spark, sf_dir):
    """``mapInArrow`` — the zero-copy Arrow-batch escape hatch
    (completes the Python surface: scalar UDF, pandas UDF, grouped map,
    cogrouped map, and now raw RecordBatches).  Right for byte-level
    work where pandas conversion costs more than it helps: here each
    batch's text column is measured with ``pyarrow.compute``
    (binary_length on the UTF-8 bytes ≙ SQL octet_length) without ever
    leaving Arrow.  Per-batch partial rows then combine in one ordinary
    JVM aggregation — the map side emits one row per (batch, lang), so
    the shuffle carries O(batches x langs), not O(rows)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = table(spark, sf_dir, "documents").select("lang", "text")

    def batch_stats(batches):
        for batch in batches:
            t = pa.table(
                {
                    "lang": batch.column("lang"),
                    "nbytes": pc.cast(
                        pc.binary_length(
                            pc.cast(batch.column("text"), pa.binary())
                        ),
                        pa.int64(),
                    ),
                }
            )
            grouped = t.group_by("lang").aggregate(
                [("nbytes", "count"), ("nbytes", "sum"), ("nbytes", "max")]
            )
            # pyarrow may return a multi-chunk aggregate; indexing
            # to_batches()[0] would silently drop the later chunks'
            # langs from the partials -- yield every batch.
            yield from grouped.rename_columns(
                ["lang", "n", "s", "m"]
            ).combine_chunks().to_batches()

    partials = d.mapInArrow(batch_stats, "lang string, n long, s long, m long")
    return partials.groupBy("lang").agg(
        F.sum("n").alias("n_docs"),
        F.sum("s").alias("total_bytes"),
        F.max("m").alias("max_bytes"),
    )
