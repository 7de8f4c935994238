"""Differential oracle tests: every SURVEY §2.B query vs DuckDB at
sf0.001 (fast twin of the driver's sf0.01 gate; run the full-scale
check with scripts/check_contract.py)."""

from __future__ import annotations

import pytest

from datastore_mapper_spark.registry import all_queries
from datastore_mapper_spark.testing import compare_query

SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, oracle, sf_dir):
    spec = SPECS[name]
    res = compare_query(spark, oracle, spec, sf_dir)
    assert res.ok, f"{name}: {'; '.join(res.problems)}"
    if spec.oracle is None:
        assert res.spark_rows >= 0  # rows-only: must at least execute
