"""Catalog normalization — environment-drift guard (round-4 VERDICT 1-2).

Round 4 was lost to a silent dependency change: the sandbox's Spark
started reading the ``timestamp[ns]`` parquet column natively as
``TIMESTAMP_NTZ`` and ``spark.sql.legacy.parquet.nanosAsLong`` became a
no-op, so the catalog's unconditional nanos-long arithmetic killed every
query.  These tests pin the fix: ``with_ts_us`` must produce the exact
same µs ``TIMESTAMP`` from EITHER physical read type, and must fail
loudly (one actionable error, not 201 stack traces) on anything else.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from datastore_mapper_spark.catalog import table, with_ts_us

# Chosen so the nanos value exercises sub-µs floor-truncation (…789 ns
# must floor to …78 µs, matching DuckDB's ts::TIMESTAMP semantics).
_NANOS = [1_704_067_200_123_456_789, 1_704_070_800_000_000_001]
_WANT_US = [n // 1000 for n in _NANOS]


def _expected(spark):
    return [
        r.want
        for r in spark.createDataFrame(
            [(us,) for us in _WANT_US], "us long"
        ).select(F.timestamp_micros("us").alias("want")).collect()
    ]


def test_with_ts_us_from_nanos_long(spark):
    """Legacy path: ts arrives as a raw nanosecond long."""
    df = spark.createDataFrame(
        [(n,) for n in _NANOS],
        StructType([StructField("ts", LongType())]),
    )
    out = with_ts_us(df)
    assert isinstance(out.schema["ts_us"].dataType, TimestampType)
    assert [r.ts_us for r in out.select("ts_us").collect()] == _expected(spark)


def test_with_ts_us_from_timestamp_ntz(spark):
    """New-environment path: ts arrives as TIMESTAMP_NTZ (Spark already
    truncated the parquet nanos to µs on read)."""
    df = spark.createDataFrame(
        [(datetime.datetime.utcfromtimestamp(0)
          + datetime.timedelta(microseconds=us),)
         for us in _WANT_US],
        StructType([StructField("ts", TimestampNTZType())]),
    )
    assert isinstance(df.schema["ts"].dataType, TimestampNTZType)
    out = with_ts_us(df)
    # must be TIMESTAMP, never NTZ: unix_micros()/watermarks require it
    assert isinstance(out.schema["ts_us"].dataType, TimestampType)
    assert [r.ts_us for r in out.select("ts_us").collect()] == _expected(spark)


def test_with_ts_us_rejects_unexpected_dtype(spark):
    df = spark.createDataFrame([("oops",)], "ts string")
    with pytest.raises(TypeError, match="events.ts read as unexpected type"):
        with_ts_us(df)


def test_events_ts_us_is_timestamp_not_ntz(spark, sf_dir):
    """Whatever this environment's parquet reader does, the catalog's
    engine-facing column is a µs TIMESTAMP usable by unix_micros()."""
    e = table(spark, sf_dir, "events")
    assert isinstance(e.schema["ts_us"].dataType, TimestampType)
    # unix_micros is the downstream consumer that broke under bare NTZ
    assert e.select(F.unix_micros("ts_us")).first()[0] is not None


def test_canary_fresh_ns_parquet_matches_duckdb(spark, tmp_path):
    """Round-5 VERDICT item 8: the end-to-end canary.  Write a FRESH
    timestamp[ns] parquet (same physical type as the fixtures), read it
    through the real Spark parquet reader + with_ts_us, and assert the
    µs values equal DuckDB's ``ts::TIMESTAMP`` interpretation of the
    same file.  The branch tests above feed with_ts_us synthetic
    frames; only this test catches a SILENT semantic change inside the
    parquet read itself (the round-4 failure mode) — the next drift
    fails one named test instead of 200 queries."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "canary_ns.parquet")
    t = pa.table({"ts": pa.array(_NANOS + [1_600_000_000_999_999_999],
                                 type=pa.timestamp("ns"))})
    pq.write_table(t, path)

    got = [
        r.us
        for r in with_ts_us(spark.read.parquet(path))
        .select(F.unix_micros("ts_us").alias("us"))
        .orderBy("us")
        .collect()
    ]
    want = [
        row[0]
        for row in duckdb.sql(
            f"SELECT epoch_us(ts::TIMESTAMP) AS us FROM '{path}' ORDER BY us"
        ).fetchall()
    ]
    assert got == want
