"""Sink + approximate-aggregate contract queries (SURVEY §2.B #55–#56).

Both are declared rows-only (no oracle): #55's result depends on a
filesystem round-trip and #56 is an HLL++ estimate no exact oracle can
reproduce.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from ..sources.writer import write_partitioned

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "_scratch")


@query(
    "sink_parquet_roundtrip",
    "sink",
    oracle="""
    SELECT l_returnflag, count(*) AS cnt
    FROM lineitem GROUP BY l_returnflag
    """,
    description="Partitioned parquet sink + read-back; read-back counts "
    "must equal the source's (oracle aggregates the source directly).",
)
def sink_parquet_roundtrip(spark, sf_dir):
    """Write lineitem partitioned by l_returnflag, read it back, count per
    partition.  Exercises the write->list->prune->scan path; the
    read-back filter prunes to a single partition directory."""
    li = table(spark, sf_dir, "lineitem")
    dest = os.path.join(_SCRATCH, "sink_parquet_roundtrip")
    write_partitioned(li, dest, ["l_returnflag"])
    back = spark.read.parquet(dest)
    return (
        back.groupBy("l_returnflag")
        .agg(F.count("*").alias("cnt"))
        .orderBy("l_returnflag")
    )


@query(
    "approx_count_distinct",
    "approx agg",
    oracle=None,
    description="HLL++ distinct-user estimate per event type (rows-only).",
)
def approx_count_distinct(spark, sf_dir):
    """approx_count_distinct — the sketch that replaces exact distinct at
    100 TB (mergeable across partitions, no expand shuffle)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count("*").alias("cnt"),
    )
