"""Source-side operators (SURVEY §2.A A1–A4).

The reference's input surface: sharded full-kind scans (scatter-sample
key ranges, namespace.go/shard.go `[REF-mem]`), namespace iteration,
filtered scans, and keys-only/projection scans.  Spark equivalents:

- A1 sharding: parquet row-group input splits give balanced parallel
  scans for free; :func:`range_shard` exposes the explicit form
  (``repartitionByRange`` samples the key distribution — the same idea
  as sorting ``__scatter__`` samples — to cut balanced ranges).
- A2 namespaces: a partition column; :func:`read_namespaced` reads a
  Hive-partitioned layout and prunes to one namespace.
- A3/A4 filtered + projection scans: ``spark.read`` with explicit
  schema; Catalyst pushes filters/projections into the scan
  (verified by tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_table(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Schema-on-read table load.  Passing an explicit ``schema``
    mirrors the reference's struct-tag loading (and skips footer
    inference for non-parquet formats)."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def range_shard(df: DataFrame, key: str, num_shards: int) -> DataFrame:
    """Explicit balanced key-range sharding (reference A1).

    ``repartitionByRange`` samples the key column to choose split
    points — the Spark-native version of sorting ``__scatter__``
    samples.  Use before range-local work (e.g. sorted file output);
    plain parallel scans do NOT need this (input splits already
    parallelize)."""
    return df.repartitionByRange(num_shards, key)


def read_namespaced(
    spark: SparkSession, base_path: str, namespace: str | None = None,
    ns_col: str = "ns",
) -> DataFrame:
    """Read a namespace-partitioned layout (reference A2: one Datastore
    namespace ≙ one partition directory).  With ``namespace`` given,
    partition pruning reads only that directory."""
    df = spark.read.parquet(base_path)
    if namespace is not None:
        df = df.filter(df[ns_col] == namespace)
    return df
