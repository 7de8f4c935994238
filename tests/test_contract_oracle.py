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


def test_contract_rows_registered_first():
    """The verification driver grades the FIRST 50 registered queries;
    the §2.B contract must own that window (and the contract tail must
    follow immediately) regardless of how modules import later."""
    from datastore_mapper_spark.queries import _CONTRACT_ORDER

    names = list(SPECS)
    assert names[: len(_CONTRACT_ORDER)] == _CONTRACT_ORDER
    # round-7 rotation (REGISTRY.md "Driver-grading rotation"): rows
    # 1-30 pinned §2.B core, row 31 the re-landed salted agg, rows
    # 32-50 the TPC-H flagships q2-q21
    assert names[30] == "agg_salted_skew_sum"
    assert names[31] == "tpch_q2_min_cost_supplier"
    assert names[49] == "tpch_q21_waiting_supplier"
    # every row of the round-7 graded window is oracle-checked
    for n in _CONTRACT_ORDER[:50]:
        assert SPECS[n].oracle is not None, n
