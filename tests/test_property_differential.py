"""Property-based differential testing (SURVEY §5.2-4c): hypothesis
generates filter predicates from a dialect-shared grammar; Spark and
DuckDB must agree on count + integer-key sum for every one."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

pytestmark = pytest.mark.filterwarnings("ignore")

STATUSES = ["F", "O", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@st.composite
def predicates(draw) -> str:
    """A predicate over ``orders`` valid in both SQL dialects."""

    def leaf() -> str:
        kind = draw(st.integers(0, 3))
        if kind == 0:
            op = draw(st.sampled_from([">", "<", ">=", "<=", "="]))
            v = draw(st.integers(1_000, 500_000))
            return f"o_totalprice {op} {v}"
        if kind == 1:
            s = draw(st.sampled_from(STATUSES))
            return f"o_orderstatus = '{s}'"
        if kind == 2:
            ps = draw(st.lists(st.sampled_from(PRIORITIES), min_size=1,
                               max_size=3, unique=True))
            inlist = ", ".join(f"'{p}'" for p in ps)
            return f"o_orderpriority IN ({inlist})"
        y = draw(st.integers(1995, 2001))
        op = draw(st.sampled_from([">=", "<"]))
        return f"o_orderdate {op} TIMESTAMP '{y}-06-01'"

    a, b = leaf(), leaf()
    joiner = draw(st.sampled_from(["AND", "OR"]))
    neg = draw(st.booleans())
    pred = f"({a}) {joiner} ({b})"
    return f"NOT ({pred})" if neg else pred


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicates())
def test_generated_filters_agree(pred, spark, oracle, sf_dir):
    from datastore_mapper_spark.catalog import load_tables

    load_tables(spark, sf_dir)  # registers the orders view
    sql = (
        "SELECT count(*) AS cnt, "
        "coalesce(CAST(sum(o_orderkey) AS BIGINT), 0) AS key_sum "
        f"FROM orders WHERE {pred}"
    )
    s = spark.sql(sql).collect()[0]
    o = oracle.execute(sql).fetchone()
    assert (s.cnt, s.key_sum) == (o[0], o[1]), pred
