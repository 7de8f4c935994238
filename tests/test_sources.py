"""Source/sink operator tests: rolled output, partitioned namespaces
with pruning, range sharding, format round-trips."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from datastore_mapper_spark.catalog import table
from datastore_mapper_spark.plans import scan_info
from datastore_mapper_spark.sources import (
    range_shard,
    read_namespaced,
    rolled_write,
    write_partitioned,
)

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "_scratch", "test_sources")


def test_rolled_write_bounds_file_sizes(spark, sf_dir):
    o = table(spark, sf_dir, "orders").coalesce(1)
    dest = os.path.join(SCRATCH, "rolled")
    rolled_write(o, dest, max_records_per_file=400)
    files = glob.glob(os.path.join(dest, "*.parquet"))
    n = o.count()
    assert len(files) >= n // 400  # files rolled every 400 records
    assert spark.read.parquet(dest).count() == n


def test_namespace_partitioned_roundtrip_and_pruning(spark, sf_dir):
    c = table(spark, sf_dir, "customer").withColumn(
        "ns", F.col("c_mktsegment")
    )
    dest = os.path.join(SCRATCH, "namespaced")
    write_partitioned(c, dest, ["ns"])
    one = read_namespaced(spark, dest, "BUILDING")
    expected = c.filter(F.col("ns") == "BUILDING").count()
    assert one.count() == expected
    # partition pruning: the BUILDING filter must not reach row scans as
    # a data filter; the directory listing handles it
    info = scan_info(one)
    assert "ns" not in ";".join(info["PushedFilters"])


def test_range_shard_balances_and_preserves_rows(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    sharded = range_shard(o, "o_orderkey", 4)
    assert sharded.count() == o.count()
    sizes = (
        sharded.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    assert len(sizes) == 4
    counts = [r["count"] for r in sizes]
    assert max(counts) <= 2 * min(counts)  # scatter-style balance


def test_csv_json_sink_roundtrip(spark, sf_dir):
    n = table(spark, sf_dir, "nation")
    for fmt in ("csv", "json", "orc"):
        dest = os.path.join(SCRATCH, f"rt_{fmt}")
        n.write.mode("overwrite").option("header", "true").format(fmt).save(dest)
        reader = spark.read.option("header", "true").option("inferSchema", "true")
        back = reader.format(fmt).load(dest)
        assert back.count() == n.count()
        assert set(back.columns) == set(n.columns)


def test_schema_evolution_merge(spark, sf_dir):
    """Schema-on-read evolution: files written before a column existed
    read back as NULL for that column under mergeSchema — Datastore's
    per-entity property sets differ the same way (SURVEY §1.1)."""
    n = table(spark, sf_dir, "nation")
    dest = os.path.join(SCRATCH, "evolving")
    n.select("n_nationkey", "n_name").write.mode("overwrite").parquet(
        os.path.join(dest, "v1")
    )
    n.select("n_nationkey", "n_name", "n_regionkey").write.mode(
        "overwrite"
    ).parquet(os.path.join(dest, "v2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(dest, "v1"), os.path.join(dest, "v2")
    )
    assert set(merged.columns) == {"n_nationkey", "n_name", "n_regionkey"}
    assert merged.count() == 2 * n.count()
    # v1 rows surface with NULL n_regionkey, not an error
    assert merged.filter(F.col("n_regionkey").isNull()).count() == n.count()


def test_corrupt_json_records_quarantined(spark, tmp_path):
    """PERMISSIVE JSON ingestion: malformed lines land in
    _corrupt_record instead of failing the job — the posture a 100 TB
    ingest needs (one bad record must not kill a 10-hour job)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "{not json at all}\n"
        '{"id": 3, "name": "fine"}\n'
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    ).cache()
    try:
        assert df.count() == 3
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert bad.count() == 1
        assert df.filter(F.col("id").isNotNull()).count() == 2
    finally:
        df.unpersist()


def test_custom_entity_datasource_sharded_scan(spark):
    """Python Data Source API: the simulated Datastore kind scan
    declares its own shard parallelism and yields deterministic
    entities per key range."""
    from datastore_mapper_spark.sources.entity_source import register

    register(spark)
    df = (
        spark.read.format("datastore_entity")
        .option("kind", "orders")
        .option("num_entities", 1000)
        .option("num_shards", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5  # one task per key range
    assert df.count() == 1000
    assert df.select(F.min("__key__"), F.max("__key__")).first() == (0, 999)
    row = df.filter(F.col("__key__") == 42).first()
    assert row.payload == "orders-00000042"
    assert row.namespace == "default"
    # Spark-side filter/projection still compose over the custom source
    assert (
        df.filter(F.col("__key__") < 100).select("payload").count() == 100
    )


def test_entity_stream_source_incremental_batches(spark, tmp_path):
    """The changefeed reader must deliver every entity exactly once
    across micro-batches, advancing its key offset like the
    reference's slice cursor."""
    import time

    from datastore_mapper_spark.sources.entity_source import register

    register(spark)
    stream = (
        spark.readStream.format("datastore_entity")
        .option("kind", "order")
        .option("num_entities", 250)
        .option("batch_size", 100)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("entity_stream_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.table("entity_stream_sink").count()
            if n >= 250:
                break
            time.sleep(1)
        rows = spark.table("entity_stream_sink").collect()
    finally:
        q.stop()
    keys = sorted(r["__key__"] for r in rows)
    assert keys == list(range(250))  # every key exactly once, no dups
    assert all(r.kind == "order" for r in rows)


def test_entity_stream_source_resumes_from_checkpoint(spark, tmp_path):
    """Restarting the changefeed against the SAME checkpoint must
    resume from the committed key offset — the second run reads ONLY
    keys the first run never delivered (the reference's resume-from-
    cursor semantics, carried by Spark's offset WAL)."""
    import time

    from datastore_mapper_spark.sources.entity_source import register

    register(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run(num_entities: int, expect: int) -> list:
        stream = (
            spark.readStream.format("datastore_entity")
            .option("kind", "resume")
            .option("num_entities", num_entities)
            .option("batch_size", 100)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            deadline = time.time() + 60
            while time.time() < deadline:
                try:
                    if spark.read.parquet(out).count() >= expect:
                        break
                except Exception:
                    pass  # sink dir not created yet
                time.sleep(0.5)
            return spark.read.parquet(out).collect()
        finally:
            q.stop()

    first = run(200, 200)
    assert sorted(r["__key__"] for r in first) == list(range(200))
    # restart with a GROWN keyspace against the SAME checkpoint: the
    # cumulative file sink must end up with every key exactly once —
    # keys 0..199 are NOT re-emitted
    second = run(350, 350)
    assert sorted(r["__key__"] for r in second) == list(range(350))


def test_entity_writer_two_phase_commit(spark, tmp_path):
    """The custom Python Data Source WRITER: rows land as JSON-lines via
    stage-then-commit — all rows present exactly once, no staging
    residue after commit."""
    import json
    import os

    from datastore_mapper_spark.sources.entity_source import register

    register(spark)
    dest = str(tmp_path / "entity_out")
    df = spark.range(250).selectExpr(
        "id AS __key__", "'demo' AS kind", "'default' AS namespace",
        "concat('demo-', id) AS payload",
    ).repartition(4)
    df.write.format("datastore_entity").option("path", dest).mode(
        "append"
    ).save()

    keys = []
    for name in os.listdir(dest):
        assert name.endswith(".jsonl")
        with open(os.path.join(dest, name)) as f:
            for line in f:
                keys.append(json.loads(line)["__key__"])
    assert sorted(keys) == list(range(250))  # exactly once, no dups
    assert not os.path.exists(os.path.join(dest, "_staging"))


def test_entity_scatter_split_balances_zipf_keyspace():
    """Scatter-sample split fidelity (round-15 VERDICT task 6 — the
    reference's __scatter__ mechanism): on a Zipf-gapped keyspace,
    KeyRange bounds cut at even RANKS of a ~0.78% key sample keep
    max/median shard size <= 1.2x, while arithmetic value-space
    bounds shatter (>= 2x, with empty shards).  Pure-Python drive of
    the reader: partitions() is the planner, read() the task."""
    import statistics

    from datastore_mapper_spark.sources.entity_source import EntityReader

    def shard_sizes(split):
        r = EntityReader({"num_entities": 20000, "num_shards": 8,
                          "keyspace": "zipf", "zipf_a": 1.5,
                          "split": split})
        return [sum(b.num_rows for b in r.read(p))
                for p in r.partitions()]

    scatter = shard_sizes("scatter")
    assert sum(scatter) == 20000                    # exactly once
    assert max(scatter) / statistics.median(scatter) <= 1.2
    arith = shard_sizes("arithmetic")
    assert sum(arith) == 20000                      # correct, just skewed
    assert max(arith) / statistics.median(arith or [1]) >= 2.0


def test_entity_batch_reader_emits_arrow_batches(spark):
    """The batch kind-scan emits pyarrow RecordBatches (round-15
    VERDICT task 1) and the engine-side frame is unchanged: same
    rows, same payload format, filters/projections still compose."""
    import pyarrow as pa

    from datastore_mapper_spark.sources.entity_source import EntityReader

    r = EntityReader({"kind": "orders", "num_entities": 300,
                      "num_shards": 3})
    parts = r.partitions()
    batches = list(r.read(parts[0]))
    assert batches and all(isinstance(b, pa.RecordBatch)
                           for b in batches)
    assert batches[0].schema.names == ["__key__", "kind",
                                       "namespace", "payload"]
    got = batches[0].to_pylist()[42]
    assert got == {"__key__": 42, "kind": "orders",
                   "namespace": "default", "payload": "orders-00000042"}
