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
_BUCKET_US = 3_600_000_000  # 1-hour skew buckets for the two-level form

# Shared by session_windows_gap30m and its skew-safe twin — both must
# reproduce exactly this single-pass lag->cumsum sessionization.
_SESSION_ORACLE = f"""
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
    """


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
    oracle=_SESSION_ORACLE,
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
    "session_windows_skewsafe",
    "stream-analogue",
    oracle=_SESSION_ORACLE,
)
def session_windows_skewsafe(spark, sf_dir):
    """Skew-hardened sessionization, bit-identical to
    ``session_windows_gap30m`` (same oracle) but with per-task input
    bounded by one (user, hour) slice instead of one whole user — the
    mega-user mitigation named in SCALE.md "Windows": a single user
    holding 1% of a 100 TB event stream serializes the plain
    lag->cumsum plan through one task; here it fans out across that
    user's hour buckets.

    Two-level algorithm:

    1. Bucket rows by ``floor(us / 1h)`` and sessionize WITHIN each
       (user, bucket) window — local lag/cumsum, task input bounded.
    2. Stitch across buckets with per-(user, bucket) summaries (one
       row each: local session count k, first/last event time).  A
       bucket's first local session continues the previous non-empty
       bucket's last session iff ``first_us - prev_last_us <= gap`` —
       exactly the row-level rule, because the boundary pair IS the
       (last event of prev bucket, first event of this bucket)
       consecutive pair.  Global id = local id + cumulative k of prior
       buckets - cumulative merge count; merged fragments then share
       one id, so the final per-(user, session) aggregate combines
       their counts and spans automatically.

    The summary-level windows partition by user but run over
    one-row-per-bucket inputs (bounded by hours in the retention
    window, not by event count).  All ids are content-derived — no
    spark_partition_id — so re-evaluation of any branch is harmless."""
    e = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts_us"))
    base = e.select("user_id", "event_id", us.alias("us")).withColumn(
        "bucket", F.floor(F.col("us") / _BUCKET_US)
    )
    w_in = Window.partitionBy("user_id", "bucket").orderBy("us", "event_id")
    flagged = base.withColumn(
        "prev_us", F.lag("us").over(w_in)
    ).withColumn(
        "is_new",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("us") - F.col("prev_us") > _GAP_US),
            1,
        ).otherwise(0),
    )
    local = flagged.withColumn(
        "local_id", F.sum("is_new").over(w_in).cast("long")
    )

    summaries = local.groupBy("user_id", "bucket").agg(
        F.max("local_id").alias("k"),
        F.min("us").alias("first_us"),
        F.max("us").alias("last_us"),
    )
    w_b = Window.partitionBy("user_id").orderBy("bucket")
    w_prior = w_b.rowsBetween(Window.unboundedPreceding, -1)
    w_incl = w_b.rowsBetween(Window.unboundedPreceding, 0)
    offsets = (
        summaries.withColumn("prev_last", F.lag("last_us").over(w_b))
        .withColumn(
            "merge",
            F.when(
                (F.col("first_us") - F.col("prev_last")) <= _GAP_US, F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "offset",
            F.coalesce(F.sum("k").over(w_prior), F.lit(0))
            - F.sum("merge").over(w_incl),
        )
        .select("user_id", "bucket", "offset")
    )

    sessions = local.join(offsets, ["user_id", "bucket"]).withColumn(
        "session_id", (F.col("offset") + F.col("local_id")).cast("long")
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
