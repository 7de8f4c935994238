"""SparkSession factory.

Centralizes the confs the engine depends on:

- ``spark.sql.legacy.parquet.nanosAsLong=true``: best-effort only.  On
  older Spark 4 builds the ``events`` fixture's ``timestamp[ns]`` is
  unreadable without it (PARQUET_TYPE_ILLEGAL); on newer builds the
  conf is a silent no-op and the column reads natively as
  ``TIMESTAMP_NTZ``.  The catalog adapts to whichever type arrives
  (``catalog.with_ts_us``) — the conf is NOT load-bearing, the dtype
  branch is (SURVEY.md §7.3-H1).
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
import warnings

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

#: Confs whose value the engine genuinely depends on for correctness.
#: ``nanosAsLong`` is deliberately NOT here: on new Spark builds it is a
#: recognized-but-inert legacy conf (sets fine, changes nothing) and the
#: catalog's dtype branch is the real guard.
_REQUIRED_CONFS = ("spark.sql.session.timeZone",)


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session.

    Used when the caller (e.g. the verify driver) owns the session.
    Correctness-critical confs are verified after setting — a conf that
    silently fails to take is exactly how round 4 lost every query — and
    a failure to apply one raises instead of being swallowed.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception as exc:
            if k in _REQUIRED_CONFS:
                raise RuntimeError(
                    f"engine-required conf {k}={v} could not be set: {exc}"
                ) from exc
            warnings.warn(f"optional engine conf {k}={v} not applied: {exc}")
    for k in _REQUIRED_CONFS:
        got = spark.conf.get(k, None)
        want = RUNTIME_CONFS[k]
        if got != want:
            raise RuntimeError(
                f"engine-required conf {k} is {got!r}, expected {want!r}; "
                "results would diverge from the DuckDB oracle"
            )
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
        # UI off by default (pytest/harness churn); bench.py opts in via
        # $SPARK_GRAFT_UI=true to read per-query executor time from the
        # status REST API (round-16 VERDICT task 1).  The AppStatusStore
        # listener runs either way, so enabling the UI only binds a port.
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return configure(builder.getOrCreate())
