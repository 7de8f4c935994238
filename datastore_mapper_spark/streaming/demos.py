"""True Structured Streaming demos (SURVEY §2.B #57–#58, rows-only).

The fixture ``events.parquet`` is replayed through the file streaming
source with ``Trigger.AvailableNow`` into a memory sink, so a finite
batch dataset exercises the real incremental machinery: watermarks,
windowed state, and ``dropDuplicatesWithinWatermark`` state eviction.
The batch twins (#43–#46) carry the oracle-checked correctness weight;
tests assert stream == batch on the same data (SURVEY §5.2-4d).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import with_ts_us
from ..session import configure

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "_scratch",
)

# State-store partition count for the finite demo replays.  A stateful
# streaming query spins up one state store PER shuffle partition per
# stateful operator (a stream-stream join runs FOUR stores per
# partition: left/right × keyToNumValues/keyWithIndexToValue), and each
# store pays fixed per-micro-batch commit overhead (delta file + WAL
# fsync) regardless of how many rows it holds.  At demo volume
# (~6×10⁵ events) 32 partitions means 128 near-empty store commits per
# batch dominating wall time — measured 9-15 s vs 3.4 s at 8 on the
# stream-stream join (round-10 sweep regression, round-11 root cause).
# At 100 TB the SAME sizing rule applies in reverse: partitions ∝ live
# state volume (keys × state row size / ~200 MB per store), set before
# the first .start() because the count is baked into the checkpoint.
STREAM_STATE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "8")
)


class _state_sized_shuffle:
    """Context manager: pin ``spark.sql.shuffle.partitions`` to the
    demo state-store count for the duration of a streaming run, then
    restore the batch setting.  The streaming planner captures the
    value at ``.start()``; batch queries after the ``with`` block see
    the original (AQE-coalesced) configuration again."""

    def __init__(self, spark: SparkSession):
        self._spark = spark

    def __enter__(self):
        self._saved = self._spark.conf.get("spark.sql.shuffle.partitions")
        self._spark.conf.set(
            "spark.sql.shuffle.partitions", str(STREAM_STATE_PARTITIONS)
        )
        return self

    def __exit__(self, *exc):
        self._spark.conf.set("spark.sql.shuffle.partitions", self._saved)
        return False


def _staged_dir(path: str) -> str:
    """The file streaming source requires a *directory*; stage the single
    fixture file into a scratch dir (hardlink when possible)."""
    tag = hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:12]
    d = os.path.join(_SCRATCH, f"stream_src_{tag}")
    dest = os.path.join(d, os.path.basename(path))
    if not os.path.exists(dest):
        os.makedirs(d, exist_ok=True)
        try:
            os.link(path, dest)
        except OSError:
            shutil.copy(path, dest)
    return d


def replay_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a file-source stream with ts normalized to µs."""
    configure(spark)
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    sdf = spark.readStream.schema(schema).parquet(_staged_dir(path))
    return with_ts_us(sdf)


def _run_to_memory(stream_df: DataFrame, output_mode: str) -> str:
    """Run a finite stream to completion into a memory sink; return the
    sink table name.

    ONLY for aggregated streams whose row count is bounded by group
    cardinality (windows × types, segments, …) — the memory sink holds
    every emitted row on the driver.  Row-level append streams must go
    through :func:`_append_via_batch_partials` instead (round-5 VERDICT
    "What's wrong" #2)."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    with _state_sized_shuffle(stream_df.sparkSession):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return name


def _append_via_batch_partials(
    spark: SparkSession,
    stream_df: DataFrame,
    partial_agg,
) -> DataFrame:
    """Run a finite APPEND-mode stream through ``foreachBatch``,
    reducing every micro-batch to a small aggregated partial written to
    scratch parquet; return the partials as a DataFrame for the caller
    to fold (the aggregate must be decomposable — counts/sums).

    This bounds driver memory independent of replay size: the memory
    sink materializes every emitted row on the driver (a 100× replay of
    a row-level stream would balloon it), whereas here row-level output
    stays on the executors and only per-batch aggregates — one row per
    (group × batch) — ever land anywhere.  This is the same
    production-sink shape as :func:`streaming_foreach_batch_etl`."""
    dest = os.path.join(_SCRATCH, "stream_partials_" + uuid.uuid4().hex[:8])

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        partial_agg(batch_df).write.mode("append").parquet(dest)

    with _state_sized_shuffle(stream_df.sparkSession):
        q = (
            stream_df.writeStream.foreachBatch(_sink)
            .trigger(availableNow=True)
            .option(
                "checkpointLocation",
                os.path.join(_SCRATCH, "ckpt_partials_" + uuid.uuid4().hex[:8]),
            )
            .start()
        )
        q.awaitTermination()
    if not os.path.exists(dest):
        # zero-batch replay (empty source): schema-stable empty result
        empty = spark.createDataFrame([], stream_df.schema)
        return partial_agg(empty).limit(0)
    return spark.read.parquet(dest)


def streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling 1 h counts with a 10-minute watermark."""
    events = replay_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts_us", "10 minutes")
        .groupBy(F.window("ts_us", "1 hour").alias("win"))
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("sum_value"))
    )
    name = _run_to_memory(agg, "complete")
    return spark.table(name).select(
        F.col("win.start").alias("window_start"), "cnt", "sum_value"
    )


def streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping event-time windows (1 h length, 30 min slide) with a
    10-minute watermark — the true-streaming twin of the batch
    explode-of-offsets formulation (#44 sliding_window_counts)."""
    events = replay_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts_us", "10 minutes")
        .groupBy(F.window("ts_us", "1 hour", "30 minutes").alias("win"))
        .agg(F.count("*").alias("cnt"))
    )
    name = _run_to_memory(agg, "complete")
    return spark.table(name).select(
        F.col("win.start").alias("window_start"), "cnt"
    )


def streaming_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (30-minute gap) under Structured
    Streaming: merging session state per user with a watermark bounding
    how long an open session can wait for stragglers — the incremental
    form of the batch ``session_window_native`` query, which is proven
    equal to the lag→cumsum SQL sessionization (the oracle)."""
    events = replay_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts_us", "10 minutes")
        .groupBy(
            F.session_window("ts_us", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
    )
    name = _run_to_memory(agg, "complete")
    return spark.table(name).select(
        "user_id", F.col("w.start").alias("session_start"), "n_events"
    )


def streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against the static
    customer dimension (dim read per micro-batch, broadcast — no
    stream-side shuffle, no state), then aggregated per market segment.
    This is the streaming form of the star join (#14)."""
    events = replay_events_stream(spark, sf_dir)
    customer = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    dim = F.broadcast(customer.select("c_custkey", "c_mktsegment"))
    joined = (
        events.join(dim, events.user_id == dim.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("sum_value"))
    )
    name = _run_to_memory(joined, "complete")
    return spark.table(name)


def streaming_foreach_batch_etl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch sink: each micro-batch lands as partitioned parquet
    via the same batch writer the Job facade uses — the streaming
    version of the reference's rolled shard output (A7) with
    exactly-once per batch_id.  Returns the read-back counts."""
    events = replay_events_stream(spark, sf_dir)
    dest = os.path.join(_SCRATCH, "stream_foreach_batch_out")
    shutil.rmtree(dest, ignore_errors=True)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.select("event_id", "user_id", "event_type", "value")
            .write.mode("append")
            .partitionBy("event_type")
            .parquet(dest)
        )

    with _state_sized_shuffle(spark):
        q = (
            events.writeStream.foreachBatch(_sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(_SCRATCH, "ckpt_feb_" + uuid.uuid4().hex[:8]))
            .start()
        )
        q.awaitTermination()
    # explicit schema: an empty replay leaves dest absent or with zero
    # partition dirs (partitionBy writes nothing for an empty batch),
    # where schema inference would fail
    written = events.select(
        "event_id", "user_id", "event_type", "value"
    ).schema
    if not os.path.exists(dest):  # zero-batch replay (empty source)
        return (
            spark.createDataFrame([], written)
            .groupBy("event_type")
            .agg(F.count("*").alias("cnt"))
        )
    return (
        spark.read.schema(written).parquet(dest)
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
    )


def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup on (user_id, event_type) with watermarked
    state eviction; result folded to counts per event type."""
    events = replay_events_stream(spark, sf_dir)
    deduped = (
        events.withWatermark("ts_us", "10 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    # append emission = each surviving row exactly once, so per-batch
    # counts are additive; fold the bounded partials, never the rows.
    partials = _append_via_batch_partials(
        spark,
        deduped,
        lambda b: b.groupBy("event_type").agg(F.count("*").alias("n")),
    )
    return partials.groupBy("event_type").agg(
        F.sum("n").alias("first_seen_pairs")
    )


def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: view events joined to the SAME user's
    purchase events within the following hour.  Both sides carry
    watermarks so the join state (buffered unmatched rows) is evicted
    once event time passes view_ts + 1 h — unbounded without it.
    Append mode: a pair emits once, when it forms."""
    events = replay_events_stream(spark, sf_dir)
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts_us").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts_us").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    pairs = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    # a pair emits exactly once (append mode), so per-batch per-user
    # pair counts are additive partials.
    partials = _append_via_batch_partials(
        spark,
        pairs,
        lambda b: b.groupBy("v_user").agg(F.count("*").alias("n")),
    )
    return partials.groupBy(F.col("v_user").alias("user_id")).agg(
        F.sum("n").alias("n_view_purchase_pairs")
    )


def _staged_two_batch_dir(sf_dir: str) -> str:
    """Stage events.parquet as TWO chronological parquet files so the
    file source (with ``maxFilesPerTrigger=1``) replays them as two
    micro-batches: the second file holds only rows later than the first
    file's median split, so nothing arrives behind the watermark."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    path = os.path.join(sf_dir, "events.parquet")
    tag = hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:12]
    d = os.path.join(_SCRATCH, f"stream_src2b_{tag}")
    f1 = os.path.join(d, "batch1.parquet")
    f2 = os.path.join(d, "batch2.parquet")
    if not (os.path.exists(f1) and os.path.exists(f2)):
        os.makedirs(d, exist_ok=True)
        t = pq.read_table(path)
        ts = pc.cast(t.column("ts"), "int64")
        med = pc.quantile(ts, q=0.5, interpolation="lower").to_pylist()[0]
        if med is None:  # empty source: two empty, schema-bearing files
            pq.write_table(t, f1)
            pq.write_table(t, f2)
        else:
            mask = pc.less_equal(ts, int(med))
            pq.write_table(t.filter(mask), f1)
            pq.write_table(t.filter(pc.invert(mask)), f2)
        now = os.path.getmtime(f2)
        os.utime(f1, (now - 60, now - 60))  # file source orders by mtime
    return d


def streaming_update_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Update-output-mode aggregation across MULTIPLE micro-batches: the
    two-file chronological replay forces two batches, so keys touched
    in both emit one update row per batch into the memory sink.  Counts
    are monotone across updates, so the final state per key is
    ``max(cnt)`` — which pytest + the oracle check against the plain
    batch aggregate.  This is the incremental-maintenance story the
    complete-mode demos don't exercise."""
    configure(spark)
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    events = with_ts_us(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_staged_two_batch_dir(sf_dir))
    )
    agg = (
        events.withWatermark("ts_us", "10 minutes")
        .groupBy("event_type", F.date_trunc("hour", "ts_us").alias("hr"))
        .agg(F.count("*").alias("cnt"))
    )
    name = _run_to_memory(agg, "update")
    return (
        spark.table(name)
        .groupBy("event_type", "hr")
        .agg(F.max("cnt").alias("cnt"))
    )


def streaming_append_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-output-mode windowed aggregation: only windows the
    watermark has CLOSED emit — exactly once, never updated again —
    the semantics a downstream immutable sink (parquet partition per
    window) requires.  The two-file chronological replay advances the
    watermark across batches; windows still open at the end (within 10
    minutes of the global max event time) are withheld, which the
    oracle mirrors with an explicit cutoff predicate."""
    configure(spark)
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    events = with_ts_us(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_staged_two_batch_dir(sf_dir))
    )
    agg = (
        events.withWatermark("ts_us", "10 minutes")
        .groupBy("event_type", F.window("ts_us", "1 hour").alias("win"))
        .agg(F.count("*").alias("cnt"))
    )
    name = _run_to_memory(agg, "append")
    return spark.table(name).select(
        "event_type", F.col("win.start").alias("window_start"), "cnt"
    )


def streaming_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained streaming ROLLUP: every micro-batch merges its partial
    aggregate into a persistent per-event-type rollup table
    (read-combine-swap inside ``foreachBatch``) — the streaming
    execution of the ``incremental_agg_maintenance`` identity, and the
    shape a 100 TB near-real-time dashboard table is actually kept
    fresh with.  Counts and integer-cent sums are commutative monoids,
    so the maintained table equals the full batch recompute REGARDLESS
    of micro-batch boundaries — which is exactly what the oracle
    verifies (a hash-checked contract, stronger than rows-only).

    The swap is write-new-then-rename (never read+overwrite the same
    path — lazy reads would race the truncation); per-batch work is
    |event_types|-sized regardless of batch rows."""
    events = replay_events_stream(spark, sf_dir)
    # drop previous runs' state/checkpoint dirs (each run gets a fresh
    # uuid so a prior session's lazily-read frame is never truncated
    # mid-read; round-7 ADVICE accumulation pattern)
    for d in os.listdir(_SCRATCH):
        if d.startswith(("stream_rollup_state_", "ckpt_rollup_")):
            shutil.rmtree(os.path.join(_SCRATCH, d), ignore_errors=True)
    tag = uuid.uuid4().hex[:8]
    state = os.path.join(_SCRATCH, f"stream_rollup_state_{tag}")
    cents = F.round(F.col("value") * 100).cast("bigint")

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        delta = batch_df.groupBy("event_type").agg(
            F.count("*").alias("cnt"),
            F.sum(cents).alias("sum_cents"),
        )
        if os.path.exists(os.path.join(state, "_SUCCESS")):
            cur = batch_df.sparkSession.read.parquet(state)
            merged = (
                cur.unionByName(delta)
                .groupBy("event_type")
                .agg(
                    F.sum("cnt").alias("cnt"),
                    F.sum("sum_cents").alias("sum_cents"),
                )
            )
        else:
            merged = delta
        new = f"{state}__next"
        merged.write.mode("overwrite").parquet(new)
        shutil.rmtree(state, ignore_errors=True)
        os.rename(new, state)

    with _state_sized_shuffle(spark):
        q = (
            events.writeStream.foreachBatch(_merge)
            .trigger(availableNow=True)
            .option(
                "checkpointLocation",
                os.path.join(_SCRATCH, f"ckpt_rollup_{tag}"),
            )
            .start()
        )
        q.awaitTermination()
    if not os.path.exists(os.path.join(state, "_SUCCESS")):
        # zero-batch replay (empty source): empty rollup
        return spark.createDataFrame(
            [], "event_type string, cnt bigint, sum_cents bigint"
        )
    return (
        spark.read.parquet(state)
        .select(
            "event_type",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.col("sum_cents").cast("bigint").alias("sum_cents"),
        )
    )


def _staged_outer_join_dir(sf_dir: str) -> str:
    """Stage events as THREE chronological micro-batch files: the two
    median-split halves, then ONE SENTINEL batch (one 'view' + one
    'purchase' row, ``user_id = -1``, at max_ts + 2 days).  The
    sentinel exists to advance BOTH sides' watermarks past every real
    row's eviction horizon: a left-OUTER stream-stream join emits its
    null-padded rows only when a LATER batch's state eviction runs
    under a watermark beyond ``view_ts + window``, and a finite replay
    that simply ends would strand every tail view in state forever —
    the classic outer-join-streaming footgun, made deterministic here
    instead of waited out.  The LATER batch is the trailing NO-DATA
    micro-batch Spark schedules whenever the last data batch moved the
    watermark (``spark.sql.streaming.noDataMicroBatches.enabled``,
    default on — availableNow replays always get one): it runs the
    stateful operators under the sentinel-advanced watermark and
    flushes every eviction/timeout.  A second sentinel file (the r14
    original) only re-did that flush one batch earlier, costing a
    full extra state-store pass per replay (~2 s x 3 consumers at
    sf0.1, measured via StreamingQueryProgress.durationMs)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "events.parquet")
    tag = hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:12]
    d = os.path.join(_SCRATCH, f"stream_src_oj3_{tag}")
    files = [os.path.join(d, f"batch{i}.parquet") for i in (1, 2, 3)]
    if not all(os.path.exists(f) for f in files):
        os.makedirs(d, exist_ok=True)
        t = pq.read_table(path)
        ts = pc.cast(t.column("ts"), "int64")
        med = pc.quantile(ts, q=0.5, interpolation="lower").to_pylist()[0]
        if med is None:  # empty source: three empty schema-bearing files
            for f in files:
                pq.write_table(t, f)
        else:
            mask = pc.less_equal(ts, int(med))
            pq.write_table(t.filter(mask), files[0])
            pq.write_table(t.filter(pc.invert(mask)), files[1])
            mx = pc.max(ts).as_py()
            day_ns = 86_400_000_000_000
            names = t.column_names
            ts_type = t.schema.field("ts").type
            cols = []
            for name in names:
                if name == "ts":
                    arr = pa.array([mx + 2 * day_ns, mx + 2 * day_ns],
                                   type=pa.int64()).cast(ts_type)
                elif name == "user_id":
                    arr = pa.array(
                        [-1, -1],
                        type=t.schema.field("user_id").type)
                elif name == "event_type":
                    arr = pa.array(["view", "purchase"])
                else:
                    arr = pa.nulls(2, t.schema.field(name).type)
                cols.append(arr)
            pq.write_table(pa.table(cols, names=names), files[2])
        now = os.path.getmtime(files[2])
        for i, f in enumerate(files[:2]):
            os.utime(f, (now - 60 * (2 - i), now - 60 * (2 - i)))
    return d


def streaming_stream_stream_left_outer(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join — the operator whose hard part is
    not the match but the NON-match: a view with no purchase in the
    following hour must emit exactly once, null-padded, and only
    state EVICTION can prove the non-match (the purchase might still
    arrive until the watermark passes view_ts + 1 h).  Matched pairs
    emit at match time; unmatched views emit when a later batch's
    eviction runs past their horizon — the sentinel batches in
    :func:`_staged_outer_join_dir` make that deterministic for a
    finite replay.  Per-batch partials keep row-level output off the
    driver, as with the inner-join demo."""
    configure(spark)
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    events = with_ts_us(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_staged_outer_join_dir(sf_dir))
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"),
                F.col("ts_us").alias("view_ts"))
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"),
                F.col("ts_us").alias("purchase_ts"))
        .withWatermark("purchase_ts", "1 hour")
    )
    pairs = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (F.col("purchase_ts")
           <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    )
    partials = _append_via_batch_partials(
        spark,
        pairs,
        lambda b: (
            b.filter(F.col("v_user") >= 0)  # drop watermark sentinels
            .groupBy("v_user")
            .agg(F.count("purchase_ts").alias("m"),
                 F.sum(F.when(F.col("purchase_ts").isNull(), 1)
                       .otherwise(0)).alias("u"))
        ),
    )
    return partials.groupBy(F.col("v_user").alias("user_id")).agg(
        F.sum("m").alias("n_matched_pairs"),
        F.sum("u").alias("n_unmatched_views"),
    )


def streaming_stream_stream_full_outer(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """FULL OUTER stream-stream join (round 14, completing the
    streaming join family after r12's inner and r13's left outer):
    BOTH sides' non-matches are state-eviction decisions — a view
    with no purchase in its following hour AND a purchase with no
    view in its preceding hour each emit exactly once, null-padded,
    only when the watermark proves the partner can no longer arrive.
    The sentinel batches advance both watermarks past every real
    row's horizon, so the finite replay flushes deterministically
    (the same :func:`_staged_outer_join_dir` staging).  Matched pairs
    emit at match time; the per-batch partial aggregate keys on
    ``coalesce(view_user, purchase_user)`` because an
    unmatched-purchase row carries NULL on the view side."""
    configure(spark)
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    events = with_ts_us(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_staged_outer_join_dir(sf_dir))
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"),
                F.col("ts_us").alias("view_ts"))
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"),
                F.col("ts_us").alias("purchase_ts"))
        .withWatermark("purchase_ts", "1 hour")
    )
    pairs = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (F.col("purchase_ts")
           <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
        "fullOuter",
    )
    uid = F.coalesce(F.col("v_user"), F.col("p_user"))
    partials = _append_via_batch_partials(
        spark,
        pairs,
        lambda b: (
            b.filter(uid >= 0)  # drop watermark sentinels
            .groupBy(uid.alias("uid"))
            .agg(
                F.sum(F.when(F.col("view_ts").isNotNull()
                             & F.col("purchase_ts").isNotNull(), 1)
                      .otherwise(0)).alias("m"),
                F.sum(F.when(F.col("view_ts").isNotNull()
                             & F.col("purchase_ts").isNull(), 1)
                      .otherwise(0)).alias("u"),
                F.sum(F.when(F.col("view_ts").isNull(), 1)
                      .otherwise(0)).alias("w"),
            )
        ),
    )
    return partials.groupBy(F.col("uid").alias("user_id")).agg(
        F.sum("m").alias("n_matched_pairs"),
        F.sum("u").alias("n_unmatched_views"),
        F.sum("w").alias("n_unmatched_purchases"),
    )
