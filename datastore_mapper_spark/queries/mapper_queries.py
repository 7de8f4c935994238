"""Job/mapper facade contract query (reference surface A3–A6 as one
end-to-end pipeline, SURVEY §2.A).

The job's logical plan (scan→filter→project→per-entity map) is
oracle-checked here; the execution side (counters, rolled output,
state machine) is pytest-checked in tests/test_mapper.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..mapper import Filter, JobConfig, register_job
from ..registry import query

_ORACLE = """
SELECT
  o_orderkey,
  o_custkey,
  o_totalprice,
  CASE
    WHEN o_totalprice > 200000 THEN 'large'
    WHEN o_totalprice > 150000 THEN 'medium'
    ELSE 'small'
  END AS size_bucket,
  CAST(o_totalprice * 0.1 AS DOUBLE) AS commission
FROM orders
WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0
"""


def _mapper(df):
    """Per-entity map (A5): derive bucket + commission, row-wise, fully
    inside Catalyst — never a Python row callback."""
    return df.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.when(F.col("o_totalprice") > 200000, "large")
        .when(F.col("o_totalprice") > 150000, "medium")
        .otherwise("small")
        .alias("size_bucket"),
        (F.col("o_totalprice") * F.lit(0.1)).cast("double").alias("commission"),
    )


@query(
    "mapper_job_etl",
    "mapper facade",
    oracle=_ORACLE,
    description="Reference Job API: filtered kind scan + projection + "
    "per-entity map as one Catalyst plan (strict Datastore filter rules).",
)
def mapper_job_etl(spark, sf_dir):
    job = register_job(
        "orders_commission_etl",
        JobConfig(
            kind="orders",
            filters=[
                Filter("o_orderstatus", "=", "F"),
                Filter("o_totalprice", ">", 100000.0),
            ],
            projection=["o_orderkey", "o_custkey", "o_totalprice"],
            mapper=_mapper,
            strict=True,  # Datastore rule: one inequality property only
        ),
    )
    return job.dataframe(spark, sf_dir)
