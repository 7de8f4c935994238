"""SparkSession factory.

Centralizes the confs the engine depends on:

- ``spark.sql.legacy.parquet.nanosAsLong=true``: the ``events`` fixture
  stores ``timestamp[ns]`` which Spark 4 otherwise refuses to read
  (PARQUET_TYPE_ILLEGAL).  The catalog re-derives a proper microsecond
  timestamp column (SURVEY.md §7.3-H1).
- ``spark.sql.session.timeZone=UTC``: deterministic timestamp rendering
  vs the DuckDB oracle.
- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  SMJ->broadcast conversion) — this is the reference's scatter-sample
  shard balancing (namespace.go/shard.go splits, SURVEY §2.A A1) done
  at runtime by the engine instead of by sampling ``__scatter__``.
- ``spark.sql.shuffle.partitions``: sized for the local test scale;
  at cluster scale AQE coalesces from a high initial number, so we set
  a modest floor here and let AQE do the rest.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that must hold on ANY session running engine code; safe to set
#: at runtime (none are static).  Applied by :func:`configure`.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session.

    Used when the caller (e.g. the verify driver) owns the session.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - static conf on exotic builds
            pass
    return spark


def get_session(
    app_name: str = "datastore-mapper-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a local session with the engine's confs.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return configure(builder.getOrCreate())
