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

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("s", DoubleType())]
)


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})


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
