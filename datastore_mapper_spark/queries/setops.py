"""Set-operation contract queries (SURVEY §2.B #31–#34).

The halves deliberately overlap so bag vs set semantics differ.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


def _halves(spark, sf_dir):
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return c.filter(F.col("c_custkey") <= 1000), c.filter(F.col("c_custkey") >= 500)


@query(
    "set_union_all",
    "set op",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey <= 1000
    UNION ALL
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey >= 500
    """,
)
def set_union_all(spark, sf_dir):
    """Bag union — overlap rows appear twice."""
    lo, hi = _halves(spark, sf_dir)
    return lo.unionAll(hi)


@query(
    "set_union_distinct",
    "set op",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey <= 1000
    UNION
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey >= 500
    """,
)
def set_union_distinct(spark, sf_dir):
    """Set union — duplicates collapse."""
    lo, hi = _halves(spark, sf_dir)
    return lo.union(hi).distinct()


@query(
    "set_intersect",
    "set op",
    oracle="""
    SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_orderkey FROM orders WHERE o_totalprice > 100000
    """,
)
def set_intersect(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    f_keys = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    big_keys = o.filter(F.col("o_totalprice") > 100000).select("o_orderkey")
    return f_keys.intersect(big_keys)


@query(
    "set_except",
    "set op",
    oracle="""
    SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_orderkey FROM orders WHERE o_totalprice > 200000
    """,
)
def set_except(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    open_keys = o.filter(F.col("o_orderstatus") == "O").select("o_orderkey")
    big_keys = o.filter(F.col("o_totalprice") > 200000).select("o_orderkey")
    return open_keys.subtract(big_keys)  # EXCEPT DISTINCT semantics
