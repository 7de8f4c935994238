"""Sink-side operators (SURVEY §2.A A7/A8).

The reference rolls one output file per shard/slice to GCS
(output.go/writer.go `[REF-mem]`, bounded file sizes), then triggers a
BigQuery load.  Spark's native equivalent: one file per task, bounded
by ``maxRecordsPerFile``, partitioned layout by key (which doubles as
the namespace partitioning of SURVEY §1.2), any columnar format.  In
production the sink format string would be ``bigquery`` (connector);
offline the stand-ins are parquet/csv/json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def rolled_write(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write with bounded ('rolled') file sizes — one file per task,
    split every ``max_records_per_file`` rows, mirroring the
    reference's per-slice file roll."""
    (
        df.write.option("maxRecordsPerFile", max_records_per_file)
        .mode(mode)
        .format(fmt)
        .save(path)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned sink (key ≙ namespace directory).  Readers
    get partition pruning on ``partition_cols`` for free."""
    df.write.partitionBy(*partition_cols).mode(mode).format(fmt).save(path)
