"""Schema-on-read table catalog.

The reference's data model is schemaless Datastore entities loaded into
typed Go structs (Kind -> struct via datastore tags; SURVEY.md §1.1).
Our equivalent: parquet files loaded into typed DataFrames and
registered as temp views — explicit normalization instead of schema
inference where the physical type needs fixing.

The one real normalization: ``events.ts`` is ``timestamp[ns]`` parquet,
readable by Spark 4 only as a raw long (nanosAsLong).  We derive the
engine-facing microsecond timestamp as
``timestamp_micros(cast(ts / 1000 as long))`` — floor-truncation of the
sub-microsecond digits, which matches the DuckDB oracle's
``ts::TIMESTAMP`` cast exactly (SURVEY.md §7.3-H1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import configure

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: (app_id, sf_dir) -> {table: DataFrame}; DataFrames are lazy plans so
#: caching them costs nothing and saves per-query re-analysis when the
#: driver invokes ~60 queries against the same session + sf_dir.
_cache: dict[tuple[str, str], dict[str, DataFrame]] = {}


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all fixture tables from ``sf_dir``, normalized, views registered.

    ``events`` gains a ``ts_us`` TimestampType column (µs, UTC) next to
    the raw nanosecond long ``ts``.
    """
    configure(spark)
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    if key in _cache:
        return _cache[key]

    tables: dict[str, DataFrame] = {}
    for name in TABLES:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if name == "events":
            # Integer division: ts is a ~1.7e18 nanosecond long; float
            # division would lose sub-µs precision (longs > 2^53).
            df = df.withColumn("ts_us", F.timestamp_micros(F.expr("ts div 1000")))
        df.createOrReplaceTempView(name)
        tables[name] = df
    _cache[key] = tables
    return tables


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_tables(spark, sf_dir)[name]
