from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from datastore_mapper_spark.session import get_session

    s = get_session("pytest", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    _preflight(s)
    yield s
    s.stop()


def _preflight(s):
    """Fail the whole session with ONE actionable diagnosis if the
    environment drifted under the engine (round-4 postmortem: the
    parquet reader's timestamp[ns] behavior changed silently and 300+
    tests produced the same opaque stack trace)."""
    try:
        from datastore_mapper_spark.catalog import load_tables

        load_tables(s, SF_DIR)
    except Exception as exc:  # pragma: no cover - only fires on drift
        pytest.exit(
            "ENVIRONMENT PREFLIGHT FAILED: the fixture catalog cannot "
            f"load from {SF_DIR}. Most likely the Spark parquet reader's "
            "handling of events.ts (timestamp[ns]) changed again — see "
            f"datastore_mapper_spark.catalog.with_ts_us. Error: {exc!r}",
            returncode=3,
        )


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle(sf_dir):
    from datastore_mapper_spark.testing import duckdb_oracle_connection

    con = duckdb_oracle_connection(sf_dir)
    yield con
    con.close()
