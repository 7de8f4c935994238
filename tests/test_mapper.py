"""Job/mapper facade tests: lifecycle, counters, strict Datastore
filter validation, rolled output, registry start-by-name."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from datastore_mapper_spark.catalog import table
from datastore_mapper_spark.mapper import (
    Filter,
    Job,
    JobConfig,
    JobState,
    default_counters,
    register_job,
    start,
)
from datastore_mapper_spark.plans import scan_info

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "_scratch", "test_mapper")


def test_job_run_counters_and_rolled_output(spark, sf_dir):
    cfg = JobConfig(
        kind="orders",
        filters=[Filter("o_orderstatus", "=", "O")],
        projection=["o_orderkey", "o_totalprice"],
        counters={**default_counters(), "total_price": F.sum("o_totalprice")},
    )
    job = Job(cfg)
    assert job.state is JobState.PENDING
    dest = os.path.join(SCRATCH, "orders_out")
    res = job.run(spark, sf_dir, output_path=dest, max_records_per_file=300)
    assert job.state is JobState.COMPLETED

    expected = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    n = expected.count()
    assert res.counters["entities_read"] == n
    assert res.counters["total_price"] == pytest.approx(
        expected.agg(F.sum("o_totalprice")).first()[0]
    )
    files = glob.glob(os.path.join(dest, "*.parquet"))
    assert len(files) >= n // 300  # rolled every 300 records
    assert spark.read.parquet(dest).count() == n


def test_job_filters_reach_parquet_scan(spark, sf_dir):
    cfg = JobConfig(
        kind="orders",
        filters=[Filter("o_orderstatus", "=", "F"),
                 Filter("o_totalprice", ">", 100000.0)],
        projection=["o_orderkey"],
    )
    df = Job(cfg).dataframe(spark, sf_dir)
    info = scan_info(df)
    pushed = ";".join(info["PushedFilters"])
    assert "o_orderstatus" in pushed and "o_totalprice" in pushed
    # keys-only projection prunes the read schema
    assert "o_comment" not in ";".join(info.get("ReadSchema", []))


def test_strict_datastore_rejects_two_inequality_props():
    cfg = JobConfig(
        kind="orders",
        filters=[Filter("o_totalprice", ">", 1.0),
                 Filter("o_orderdate", "<", "1995-01-01")],
        strict=True,
    )
    with pytest.raises(ValueError, match="at most one"):
        Job(cfg)


def test_strict_allows_many_equality_plus_one_inequality():
    cfg = JobConfig(
        kind="orders",
        filters=[Filter("o_orderstatus", "=", "F"),
                 Filter("o_orderpriority", "=", "1-URGENT"),
                 Filter("o_totalprice", ">", 1.0)],
        strict=True,
    )
    Job(cfg)  # must not raise


def test_registry_start_by_name(spark, sf_dir):
    register_job(
        "nation_copy",
        JobConfig(kind="nation", counters=default_counters()),
    )
    res = start("nation_copy", spark, sf_dir)
    assert res.state is JobState.COMPLETED
    assert res.counters["entities_read"] == 25


def test_shards_require_key():
    with pytest.raises(ValueError, match="shard_key"):
        Job(JobConfig(kind="orders", shards=4))


def test_sharded_output_partition_count(spark, sf_dir):
    cfg = JobConfig(kind="orders", shards=4, shard_key="o_orderkey")
    df = Job(cfg).dataframe(spark, sf_dir)
    assert df.rdd.getNumPartitions() == 4


def test_lifecycle_hooks_fire_on_complete(spark, sf_dir):
    seen = []
    job = Job(
        JobConfig(kind="nation", counters=default_counters()),
        on_complete=lambda res: seen.append(res.counters["entities_read"]),
    )
    job.run(spark, sf_dir)
    assert seen == [25]


def test_lifecycle_hooks_fire_on_fail(spark, sf_dir):
    failures = []
    job = Job(
        JobConfig(kind="nation",
                  mapper=lambda df: df.select("no_such_column")),
        on_fail=lambda exc: failures.append(type(exc).__name__),
    )
    with pytest.raises(Exception):
        job.run(spark, sf_dir)
    assert job.state is JobState.FAILED
    assert len(failures) == 1


def test_run_per_namespace_iterates_and_counts(spark, sf_dir, tmp_path):
    from datastore_mapper_spark.mapper import run_per_namespace
    from datastore_mapper_spark.sources.writer import write_partitioned

    c = table(spark, sf_dir, "customer").withColumn("ns", F.col("c_mktsegment"))
    base = str(tmp_path / "namespaced")
    write_partitioned(c, base, ["ns"])

    job = Job(JobConfig(kind="customer", counters=default_counters()))
    results = run_per_namespace(job, spark, base)
    assert set(results) == {
        r.c_mktsegment
        for r in c.select("c_mktsegment").distinct().collect()
    }
    expected = {
        r.ns: r.cnt
        for r in c.groupBy("ns").agg(F.count("*").alias("cnt")).collect()
    }
    got = {ns: res.counters["entities_read"] for ns, res in results.items()}
    assert got == expected


def test_run_per_namespace_fires_lifecycle_hooks(spark, sf_dir, tmp_path):
    """A2 must ride the A10 state machine: on_complete fires once per
    namespace, and a failing namespace flips to FAILED, fires on_fail,
    and aborts the remaining namespaces."""
    import pytest

    from datastore_mapper_spark.mapper import JobState, run_per_namespace
    from datastore_mapper_spark.sources.writer import write_partitioned

    c = table(spark, sf_dir, "customer").withColumn("ns", F.col("c_mktsegment"))
    base = str(tmp_path / "namespaced")
    write_partitioned(c, base, ["ns"])
    n_namespaces = c.select("c_mktsegment").distinct().count()

    completed, failed = [], []
    job = Job(
        JobConfig(kind="customer", counters=default_counters()),
        on_complete=lambda res: completed.append(res),
        on_fail=lambda exc: failed.append(exc),
    )
    results = run_per_namespace(job, spark, base)
    assert len(completed) == n_namespaces == len(results)
    assert not failed
    assert job.state is JobState.COMPLETED

    # a mapper that references a missing column fails analysis in the
    # first namespace: on_fail fires, state flips, nothing completes
    completed.clear()
    bad = Job(
        JobConfig(kind="customer", mapper=lambda df: df.select("no_such_col")),
        on_complete=lambda res: completed.append(res),
        on_fail=lambda exc: failed.append(exc),
    )
    with pytest.raises(Exception):
        run_per_namespace(bad, spark, base)
    assert len(failed) == 1
    assert not completed
    assert bad.state is JobState.FAILED


def test_run_per_namespace_applies_run_kwargs(spark, sf_dir, tmp_path):
    """partition_by and max_records_per_file must reach each
    per-namespace write (they were silently dropped before round 3)."""
    import os

    from datastore_mapper_spark.mapper import run_per_namespace
    from datastore_mapper_spark.sources.writer import write_partitioned

    c = table(spark, sf_dir, "customer").withColumn("ns", F.col("c_mktsegment"))
    base = str(tmp_path / "namespaced")
    write_partitioned(c, base, ["ns"])

    job = Job(JobConfig(kind="customer", projection=["c_custkey", "c_nationkey"]))
    out = str(tmp_path / "out")
    results = run_per_namespace(
        job, spark, base, output_base=out, partition_by=["c_nationkey"]
    )
    ns0 = sorted(results)[0]
    ns_dir = os.path.join(out, f"ns={ns0}")
    assert any(e.startswith("c_nationkey=") for e in os.listdir(ns_dir))
