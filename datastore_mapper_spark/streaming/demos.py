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

from ..session import configure

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "_scratch",
)


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
    return sdf.withColumn("ts_us", F.timestamp_micros(F.expr("ts div 1000")))


def _run_to_memory(stream_df: DataFrame, output_mode: str) -> str:
    """Run a finite stream to completion into a memory sink; return the
    sink table name."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name


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


def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup on (user_id, event_type) with watermarked
    state eviction; result folded to counts per event type."""
    events = replay_events_stream(spark, sf_dir)
    deduped = (
        events.withWatermark("ts_us", "10 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    name = _run_to_memory(deduped, "append")
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count("*").alias("first_seen_pairs"))
    )
