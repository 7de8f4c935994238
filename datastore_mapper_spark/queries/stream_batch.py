"""Stream-analogue contract queries (SURVEY §2.B #43–#46): batch twins
of the Structured Streaming operators, formulated identically on both
engines so they are oracle-checkable (the oracle cannot run streams —
true streaming lives in queries/streaming_queries.py as rows-only).

All event-time math is exact integer microseconds (no FP), and the
nanosecond source column is normalized once in the catalog (§7.3-H1).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap


@query(
    "tumbling_window_1h",
    "stream-analogue",
    oracle="""
    SELECT CAST(date_trunc('hour', ts::TIMESTAMP) AS TIMESTAMP) AS window_start,
           count(*) AS cnt,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def tumbling_window_1h(spark, sf_dir):
    """Event-time tumbling 1 h aggregation — batch twin of
    ``groupBy(F.window(ts, '1 hour'))``."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts_us").alias("window_start"))
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


@query(
    "sliding_window_counts",
    "stream-analogue",
    oracle="""
    SELECT ws AS window_start, count(*) AS cnt
    FROM (
        SELECT unnest([
            CAST(date_trunc('hour', ts::TIMESTAMP) AS TIMESTAMP),
            CAST(date_trunc('hour', ts::TIMESTAMP) AS TIMESTAMP)
              - INTERVAL 1 HOUR
        ]) AS ws
        FROM events
    )
    GROUP BY ws
    """,
)
def sliding_window_counts(spark, sf_dir):
    """2 h windows sliding 1 h: each event lands in exactly two windows,
    materialized by exploding the two window starts (batch twin of
    ``F.window(ts, '2 hours', '1 hour')``)."""
    e = table(spark, sf_dir, "events")
    trunc = F.date_trunc("hour", "ts_us")
    return (
        e.select(
            F.explode(
                F.array(trunc, trunc - F.expr("INTERVAL 1 HOUR"))
            ).alias("window_start")
        )
        .groupBy("window_start")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "session_windows_gap30m",
    "stream-analogue",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id,
               epoch_us(ts::TIMESTAMP) AS us,
               lag(epoch_us(ts::TIMESTAMP)) OVER
                 (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)
                 AS prev_us
        FROM events
    ), flagged AS (
        SELECT user_id, event_id, us,
               CASE WHEN prev_us IS NULL OR us - prev_us > {_GAP_US}
                    THEN 1 ELSE 0 END AS is_new
        FROM ordered
    ), sessions AS (
        SELECT user_id, us,
               CAST(sum(is_new) OVER
                 (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT)
                 AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           max(us) - min(us) AS span_us
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def session_windows_gap30m(spark, sf_dir):
    """Sessionization with a 30-min inactivity gap: lag-gap flag ->
    running-sum session id -> per-session aggregation.  Batch twin of
    ``F.session_window(ts, '30 minutes')``; exact µs arithmetic."""
    e = table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("us", "event_id")
    us = F.unix_micros(F.col("ts_us"))
    base = e.select("user_id", "event_id", us.alias("us"))
    with_prev = base.withColumn("prev_us", F.lag("us").over(order))
    flagged = with_prev.withColumn(
        "is_new",
        F.when(
            F.col("prev_us").isNull() | (F.col("us") - F.col("prev_us") > _GAP_US), 1
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("is_new").over(order).cast("long")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max("us") - F.min("us")).alias("span_us"),
    )


@query(
    "late_data_watermark_sim",
    "stream-analogue",
    oracle="""
    WITH wm AS (
        SELECT max(ts::TIMESTAMP) - INTERVAL 10 MINUTE AS cutoff FROM events
    )
    SELECT CAST(date_trunc('minute', ts::TIMESTAMP) AS TIMESTAMP)
             AS minute_start,
           count(*) AS cnt
    FROM events, wm
    WHERE ts::TIMESTAMP >= wm.cutoff
    GROUP BY 1
    """,
)
def late_data_watermark_sim(spark, sf_dir):
    """Watermark-drop simulation: events older than (global max event time
    - 10 min) are 'late' and dropped before a 1-min window count.  The
    scalar max is broadcast, not a windowed max over everything."""
    e = table(spark, sf_dir, "events")
    cutoff = e.agg(
        (F.max("ts_us") - F.expr("INTERVAL 10 MINUTE")).alias("cutoff")
    )
    return (
        e.crossJoin(F.broadcast(cutoff))
        .filter(F.col("ts_us") >= F.col("cutoff"))
        .groupBy(F.date_trunc("minute", "ts_us").alias("minute_start"))
        .agg(F.count("*").alias("cnt"))
    )
