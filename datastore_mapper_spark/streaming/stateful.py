"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §3.2 entry point 3; the escape hatch for operators Spark's
built-in stateful set lacks).

Demo operator: per-user running event statistics.  Each micro-batch
updates a (count, value-sum) GroupState per user and emits the user's
totals so far — the streaming form of a grouped aggregate maintained
incrementally.  At scale, state lives in the executor StateStore
(RocksDB in production) checkpointed to the WAL — the engine analogue
of the reference's per-shard cursor + counters persisted per slice
(slice.go `[REF-mem]`, SURVEY §2.A A9/A6).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from .demos import _run_to_memory, replay_events_stream

# Totals carry value as INTEGER CENTS (floor(value*100)) rather than a
# float running sum: integer accumulation is associative and
# batch-order-independent, which is what makes the final state
# hash-comparable against a SQL oracle (round-10 promotion of
# stream_stateful_user_totals from rows-only to oracle-checked) — a
# float sum's low bits would depend on Arrow batch boundaries.
OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_cents", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("s", LongType())]
)


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += int(np.floor(pdf["value"].to_numpy() * 100).sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_cents": [s]})


def streaming_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay events through the stateful operator; return final per-user
    totals (one row per user per micro-batch; the last wins — with
    AvailableNow on a single directory there is one batch)."""
    events = replay_events_stream(spark, sf_dir)
    totals = (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = _run_to_memory(totals, "update")
    return spark.table(name)


# --- the Spark 4 successor API: transformWithStateInPandas ------------
#
# ``applyInPandasWithState`` (above) is the stable escape hatch;
# ``transformWithStateInPandas`` is its typed successor — named state
# variables (ValueState/ListState/MapState), timers, and TTL on a
# StatefulProcessor class.  Requires the RocksDB state store provider
# AND a working google.protobuf (its driver worker speaks protobuf to
# the JVM).  protobuf is broken in this container, so this path is
# import-gated: the implementation is complete and the pytest skips
# unless ``google.protobuf.descriptor`` imports (tests/test_streaming
# .py::test_tws_user_totals_equals_batch).

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

TWS_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_cents", LongType()),
    ]
)


class _UserTotalsProcessor(StatefulProcessor):
    """Per-user running totals in a typed ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", StructType([StructField("n", LongType()),
                                  StructField("s", LongType())])
        )

    def handleInputRows(self, key, rows, timerValues):
        n, s = self._totals.get() if self._totals.exists() else (0, 0)
        for pdf in rows:
            n += len(pdf)
            s += int(np.floor(pdf["value"].to_numpy() * 100).sum())
        self._totals.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_cents": [s]}
        )

    def close(self) -> None:
        pass


_STATE_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def streaming_user_totals_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``transformWithStateInPandas`` twin of
    :func:`streaming_user_totals` — same semantics, typed state API.

    transformWithState requires the RocksDB state store provider; the
    session conf is flipped only for this query's run and restored in a
    ``finally`` — the shared session's later streaming queries must not
    silently inherit RocksDB (round-2 VERDICT item 6)."""
    prev = spark.conf.get(_STATE_PROVIDER_KEY, None)
    spark.conf.set(
        _STATE_PROVIDER_KEY,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        events = replay_events_stream(spark, sf_dir)
        totals = (
            events.select("user_id", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=_UserTotalsProcessor(),
                outputStructType=TWS_OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )
        name = _run_to_memory(totals, "update")
    finally:
        if prev is None:
            spark.conf.unset(_STATE_PROVIDER_KEY)
        else:
            spark.conf.set(_STATE_PROVIDER_KEY, prev)
    return spark.table(name)


# --- streaming twin of the batch clamped-ledger scan ------------------

LEDGER_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("rn", LongType()),
        StructField("balance", LongType()),
    ]
)

LEDGER_STATE_SCHEMA = StructType(
    [StructField("balance", LongType()), StructField("rn", LongType())]
)


def _update_ledger(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Carry the clamped balance across micro-batches with the SAME
    kernel as the batch operator (operators/ledger.py) — the reuse the
    ledger docstring promises.  Each batch sorts its slice of the
    key's history, folds it through the kernel with the carried-in
    balance, and emits the key's cumulative (rn, balance) frontier."""
    import numpy as np

    from ..operators.ledger import CAP_CENTS, clamped_balance_kernel

    bal, rn = state.get if state.exists else (0, 0)
    chunks = [p for p in pdfs if len(p)]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["us", "event_id"], kind="mergesort")
        out = clamped_balance_kernel(
            pdf["delta"].to_numpy(dtype=np.int64), cap=CAP_CENTS, start=bal
        )
        bal = int(out[-1])
        rn += len(out)
    state.update((bal, rn))
    yield pd.DataFrame(
        {"user_id": [key[0]], "rn": [rn], "balance": [bal]}
    )


def streaming_ledger_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained clamped ledger over the TWO-micro-batch
    chronological replay: the second batch's balances depend on the
    first batch's carried GroupState, so this exercises real
    cross-batch state (not a single-batch degenerate run).  Emits each
    user's cumulative frontier per batch (update mode, |users|-bounded
    memory sink); the final state per user is the max-rn row, which
    pytest checks equal to the batch operator's last row per user."""
    import os as _os

    from pyspark.sql import functions as F

    from ..catalog import with_ts_us
    from .demos import _staged_two_batch_dir
    from ..session import configure

    configure(spark)
    path = _os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    events = with_ts_us(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_staged_two_batch_dir(sf_dir))
    )
    cents = F.floor(F.col("value") * 100).cast("long")
    keyed = events.select(
        "user_id",
        F.unix_micros(F.col("ts_us")).alias("us"),
        "event_id",
        F.when(F.col("event_type").isin("purchase", "signup"), cents)
        .otherwise(-cents)
        .alias("delta"),
    )
    frontier = keyed.groupBy("user_id").applyInPandasWithState(
        _update_ledger,
        outputStructType=LEDGER_OUTPUT_SCHEMA,
        stateStructType=LEDGER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = _run_to_memory(frontier, "update")
    sink = spark.table(name)
    # fold the per-batch frontiers: the max-rn row per user is final
    from pyspark.sql import Window as _W

    w = _W.partitionBy("user_id").orderBy(F.desc("rn"))
    return (
        sink.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("user_id", "rn", "balance")
    )


# --- event-time-timeout sessionization (round 14) ---------------------

_SESSION_GAP_US = 30 * 60 * 1_000_000
_SESSION_GAP_MS = 30 * 60 * 1_000

SESSION_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start_us", LongType()),
    StructField("n_events", LongType()),
])

SESSION_STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
    StructField("n", LongType()),
])


def _update_sessions(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """30-minute-gap sessionizer with EVENT-TIME TIMEOUT: sessions
    closed by a later in-batch event emit immediately; the trailing
    open session emits when the WATERMARK passes its end + gap —
    either via the state timeout callback (``hasTimedOut``) or
    eagerly when the current watermark already proves no extension
    can arrive.  State per user is one (start, end, n) triple —
    bounded, and evicted the moment the session provably closed
    (the semantics Spark's built-in ``session_window`` applies,
    reimplemented on the raw state API so the timeout surface is
    exercised)."""
    out: list[tuple[int, int, int]] = []
    uid = key[0]
    if state.hasTimedOut:
        if state.exists:
            st, en, n = state.get
            out.append((uid, st, n))
        state.remove()
        yield pd.DataFrame(
            {"user_id": [uid] * len(out),
             "session_start_us": [o[1] for o in out],
             "n_events": [o[2] for o in out]})
        return
    rows = [pdf[["us", "event_id"]] for pdf in pdfs if len(pdf)]
    cur = list(state.get) if state.exists else None
    if rows:
        # vectorized sessionizer (round-17, guide §4.2): session
        # boundaries are exactly the positions whose gap from the
        # previous event is >= the half-open [start, start+gap)
        # extension window — an event EXACTLY gap after the previous
        # one starts a NEW session, matching Spark's built-in
        # session_window boundary semantics (round-14 ADVICE).  The
        # old per-event Python loop was the dominant per-batch cost
        # (~50k interpreted iterations/batch at sf0.1).
        import numpy as np

        batch = pd.concat(rows).sort_values(["us", "event_id"])
        us = batch["us"].to_numpy().astype(np.int64, copy=False)
        new_flag = np.empty(len(us), dtype=bool)
        new_flag[1:] = (us[1:] - us[:-1]) >= _SESSION_GAP_US
        new_flag[0] = (cur is None
                       or us[0] - cur[1] >= _SESSION_GAP_US)
        starts = np.flatnonzero(new_flag)
        bounds = np.r_[starts, len(us)]
        sessions: list[list[int]] = []
        if cur is not None and not new_flag[0]:
            # leading run extends the carried-in session
            lead_end = int(bounds[0]) if len(starts) else len(us)
            sessions.append(
                [cur[0], int(us[lead_end - 1]), cur[2] + lead_end])
        elif cur is not None:
            sessions.append(cur)  # closes when the first new one opens
        for i in range(len(starts)):
            a, b = int(bounds[i]), int(bounds[i + 1])
            sessions.append([int(us[a]), int(us[b - 1]), b - a])
        for s in sessions[:-1]:  # all but the trailing session close
            out.append((uid, s[0], s[2]))
        cur = sessions[-1]
    if cur is not None:
        wm_ms = state.getCurrentWatermarkMs()
        close_at_ms = cur[1] // 1000 + _SESSION_GAP_MS + 1
        if wm_ms and close_at_ms <= wm_ms:
            out.append((uid, cur[0], cur[2]))  # already provably closed
            state.remove()
        else:
            state.update(tuple(cur))
            state.setTimeoutTimestamp(close_at_ms)
    yield pd.DataFrame(
        {"user_id": [o[0] for o in out],
         "session_start_us": [o[1] for o in out],
         "n_events": [o[2] for o in out]})


def streaming_sessionize_stateful(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Replay events through the event-time-timeout sessionizer and
    return per-user session aggregates.  The three-batch staging
    (two chronological halves + one far-future watermark sentinel,
    shared with the outer-join rows) makes every timeout fire inside
    the finite replay: the sentinel batch advances the watermark past
    every real session's close horizon, and the trailing no-data
    micro-batch's trigger delivers the timeouts.  Output rows are
    session-count-bounded (append mode), so the memory sink holds
    sessions, never events."""
    import os as _os

    from pyspark.sql import functions as F

    from ..catalog import with_ts_us
    from ..session import configure
    from .demos import _run_to_memory, _staged_outer_join_dir

    configure(spark)
    path = _os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    events = with_ts_us(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_staged_outer_join_dir(sf_dir))
    )
    # The sentinel rows (user_id = -1) MUST reach the watermark
    # operator: a pre-groupBy filter gets PUSHED BELOW the
    # EventTimeWatermark node by the optimizer, the sentinels never
    # feed max-event-time, the watermark stalls at the last real
    # row - delay, and every trailing session whose close horizon
    # lies beyond it is silently stranded in state (observed: exactly
    # the global-max-timestamp user's final session went missing).
    # So the sentinels flow through the stateful operator as their
    # own key and are dropped from the OUTPUT instead.
    keyed = (
        events.withWatermark("ts_us", "1 minute")
        # ts_us stays in the frame: event-time timeout requires the
        # watermarked column to survive into the stateful operator
        .select("user_id", "ts_us",
                F.unix_micros(F.col("ts_us")).alias("us"), "event_id")
    )
    sessions = keyed.groupBy("user_id").applyInPandasWithState(
        _update_sessions,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    ).filter(F.col("user_id") >= 0)
    name = _run_to_memory(sessions, "append")
    sink = spark.table(name)
    from pyspark.sql import functions as F2

    return sink.groupBy("user_id").agg(
        F2.count("*").alias("n_sessions"),
        F2.sum("n_events").cast("bigint").alias("n_events"),
        F2.max("n_events").cast("bigint").alias("max_session_events"),
    )
