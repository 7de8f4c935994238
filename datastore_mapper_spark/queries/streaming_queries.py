"""True-streaming contract queries (SURVEY §2.B #57–#58, rows-only —
the DuckDB oracle cannot run streams; pytest asserts stream == batch
twin instead)."""

from __future__ import annotations

from ..registry import query
from ..streaming.demos import (
    streaming_dedup,
    streaming_stream_stream_join,
    streaming_foreach_batch_etl,
    streaming_session,
    streaming_sliding,
    streaming_static_join,
    streaming_tumbling,
)
from ..streaming.stateful import streaming_user_totals


@query(
    "stream_tumbling_demo",
    "streaming",
    oracle="""
    SELECT date_trunc('hour', ts::TIMESTAMP) AS window_start,
           count(*) AS cnt, round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1
    """,
    description="Structured Streaming tumbling window + watermark "
    "(rows-only; equals batch twin tumbling_window_1h).",
)
def stream_tumbling_demo(spark, sf_dir):
    return streaming_tumbling(spark, sf_dir)


@query(
    "stream_dropDuplicates_demo",
    "streaming",
    oracle="""
    SELECT event_type, count(*) AS first_seen_pairs
    FROM (SELECT DISTINCT user_id, event_type FROM events)
    GROUP BY event_type
    """,
    description="Streaming stateful dedup within watermark (rows-only).",
)
def stream_dropDuplicates_demo(spark, sf_dir):
    return streaming_dedup(spark, sf_dir)


@query(
    "stream_sliding_demo",
    "streaming",
    oracle="""
    WITH e AS (SELECT ts::TIMESTAMP AS t FROM events),
    w AS (
        SELECT time_bucket(INTERVAL 30 MINUTE, t) AS s FROM e
        UNION ALL
        SELECT time_bucket(INTERVAL 30 MINUTE, t) - INTERVAL 30 MINUTE
        FROM e
    )
    SELECT s AS window_start, count(*) AS cnt FROM w GROUP BY s
    """,
    description="True streaming sliding windows (1 h / 30 min slide) with "
    "watermark (rows-only; pytest asserts equality with the batch twin).",
)
def stream_sliding_demo(spark, sf_dir):
    return streaming_sliding(spark, sf_dir)


@query(
    "stream_static_join_demo",
    "streaming",
    oracle="""
    SELECT c_mktsegment, count(*) AS cnt,
           round(sum(value), 4) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c_mktsegment
    """,
    description="Stream-static broadcast join against the customer dim + "
    "agg per segment (rows-only; pytest asserts equality with batch).",
)
def stream_static_join_demo(spark, sf_dir):
    return streaming_static_join(spark, sf_dir)


@query(
    "stream_foreach_batch_sink",
    "streaming",
    oracle="""
    SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type
    """,
    description="foreachBatch partitioned-parquet sink (streaming rolled "
    "output, A7) + read-back counts (rows-only).",
)
def stream_foreach_batch_sink(spark, sf_dir):
    return streaming_foreach_batch_etl(spark, sf_dir)


@query(
    "stream_stream_join_demo",
    "streaming",
    oracle="""
    SELECT v.user_id, count(*) AS n_view_purchase_pairs
    FROM (SELECT user_id, ts::TIMESTAMP AS vt FROM events
          WHERE event_type = 'view') v
    JOIN (SELECT user_id, ts::TIMESTAMP AS pt FROM events
          WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.pt > v.vt AND p.pt <= v.vt + INTERVAL 1 HOUR
    GROUP BY v.user_id
    """,
    description="Stream-stream inner join (view->purchase within 1h, "
    "watermarked state eviction; rows-only; pytest asserts equality "
    "with the batch twin).",
)
def stream_stream_join_demo(spark, sf_dir):
    return streaming_stream_stream_join(spark, sf_dir)


@query(
    "stream_stateful_user_totals",
    "streaming",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(floor(value * 100)) AS BIGINT) AS sum_cents
    FROM events GROUP BY user_id
    """,
    description="Custom stateful operator via applyInPandasWithState: "
    "incrementally-maintained per-user totals. Promoted to "
    "oracle-checked in round 10: state accumulates integer cents "
    "(order-independent), so the replayed final state hash-matches "
    "the batch aggregate the oracle states.",
)
def stream_stateful_user_totals(spark, sf_dir):
    return streaming_user_totals(spark, sf_dir)


@query(
    "stream_update_mode_demo",
    "streaming",
    oracle="""
    SELECT event_type,
           date_trunc('hour', ts::TIMESTAMP) AS hr,
           count(*) AS cnt
    FROM events
    GROUP BY 1, 2
    """,
    description="Update-output-mode agg over a forced two-micro-batch "
    "replay (maxFilesPerTrigger=1); final state folded with max(cnt) "
    "since counts are monotone across updates.",
)
def stream_update_mode_demo(spark, sf_dir):
    from ..streaming.demos import streaming_update_mode

    return streaming_update_mode(spark, sf_dir)


@query(
    "stream_session_window_demo",
    "streaming",
    oracle="""
    WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts_us FROM events),
    flag AS (
        SELECT user_id, ts_us,
               CASE WHEN ts_us - lag(ts_us) OVER w > INTERVAL 30 MINUTE
                         OR lag(ts_us) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
    ),
    sess AS (
        SELECT user_id, ts_us,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flag
    )
    SELECT user_id, min(ts_us) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    description="Structured Streaming native session windows with "
    "merging state + watermark; hash-matched against the lag-cumsum "
    "SQL sessionization.",
)
def stream_session_window_demo(spark, sf_dir):
    return streaming_session(spark, sf_dir)


@query(
    "stream_entity_source_demo",
    "streaming/source",
    # PROMOTED round 16 (VERDICT task 7) from rows-only: the
    # changefeed generator is a closed-form law (keys 0..199 exactly
    # once), so the drained sink's fold is HASHABLE against the SQL
    # statement of that law — count, first key, and the key checksum
    # each break on a dropped, duplicated, or replayed micro-batch.
    # The per-batch cursor mechanics stay pytest-asserted in
    # tests/test_sources.py::test_entity_stream_source_incremental_batches
    oracle="""
    SELECT CAST('demo' AS VARCHAR) AS kind,
           CAST(200 AS BIGINT) AS n,
           CAST(0 AS BIGINT) AS first_key,
           CAST(19900 AS BIGINT) AS key_sum
    """,
    description="Streaming read of the custom Python Data Source "
    "changefeed (key-cursor offsets in the checkpoint WAL); the "
    "drained fold hash-matches the generator law.",
)
def stream_entity_source_demo(spark, sf_dir):
    import tempfile

    from ..sources.entity_source import register

    register(spark)
    stream = (
        spark.readStream.format("datastore_entity")
        .option("kind", "demo")
        .option("num_entities", 200)
        .option("batch_size", 80)
        .load()
    )
    name = "entity_stream_demo_sink"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    try:
        # the source emits exactly num_entities=200 keys then idles:
        # drain it driver-side instead of polling the sink with a
        # count() job every 0.5 s
        q.processAllAvailable()
    finally:
        q.stop()
    from pyspark.sql import functions as F

    return spark.table(name).groupBy("kind").agg(
        F.count("*").alias("n"),
        F.min("__key__").alias("first_key"),
        F.sum("__key__").cast("bigint").alias("key_sum"),
    )


@query(
    "stream_append_mode_demo",
    "streaming",
    oracle="""
    WITH e AS (SELECT event_type, ts::TIMESTAMP AS t FROM events),
    cut AS (SELECT max(t) - INTERVAL 10 MINUTE AS c FROM e)
    SELECT event_type,
           date_trunc('hour', t) AS window_start,
           count(*) AS cnt
    FROM e, cut
    GROUP BY event_type, date_trunc('hour', t), cut.c
    HAVING date_trunc('hour', t) + INTERVAL 1 HOUR <= cut.c
    """,
    description="Append-output-mode windowed aggregation: only "
    "watermark-closed windows emit, exactly once — hash-matched "
    "against the explicit cutoff predicate.",
)
def stream_append_mode_demo(spark, sf_dir):
    from ..streaming.demos import streaming_append_mode

    return streaming_append_mode(spark, sf_dir)


@query(
    "stream_incremental_rollup",
    "streaming",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events
    GROUP BY event_type
    """,
    description="Maintained streaming rollup: foreachBatch merges each "
    "micro-batch's partial aggregate into a persistent table "
    "(read-combine-swap); the maintained result must HASH-equal the "
    "full batch recompute — the streaming execution of "
    "incremental_agg_maintenance.",
)
def stream_incremental_rollup(spark, sf_dir):
    from ..streaming.demos import streaming_incremental_rollup

    return streaming_incremental_rollup(spark, sf_dir)


@query(
    "stream_ledger_balance_demo",
    "streaming",
    # PROMOTED round 16 (VERDICT task 7) from rows-only: the emitted
    # fold is each user's FINAL frontier (max-rn row), which the
    # recursive-CTE restatement of the clamped recurrence pins
    # exactly — a dropped micro-batch, stale carried state, or a
    # double-applied delta shifts some user's final balance or rn.
    oracle="""
    WITH RECURSIVE e AS (
        SELECT user_id,
               CAST(row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts::TIMESTAMP, event_id)
                    AS BIGINT) AS rn,
               CASE WHEN event_type IN ('purchase', 'signup')
                    THEN CAST(floor(value * 100) AS BIGINT)
                    ELSE -CAST(floor(value * 100) AS BIGINT)
               END AS delta
        FROM events
    ), bal AS (
        SELECT user_id, rn,
               CAST(least(50000, greatest(0, delta)) AS BIGINT) AS balance
        FROM e WHERE rn = 1
        UNION ALL
        SELECT e.user_id, e.rn,
               CAST(least(50000, greatest(0, b.balance + e.delta))
                    AS BIGINT) AS balance
        FROM bal b JOIN e ON e.user_id = b.user_id AND e.rn = b.rn + 1
    ), last AS (
        SELECT user_id, max(rn) AS rn FROM bal GROUP BY user_id
    )
    SELECT b.user_id, b.rn, b.balance
    FROM bal b JOIN last USING (user_id, rn)
    """,
    description="Streaming twin of ledger_capped_balance: the clamped "
    "(non-associative) balance carried across two chronological "
    "micro-batches in GroupState, SAME numpy kernel as the batch "
    "applyInPandas scan; the final frontier per user hash-matches "
    "the recursive-CTE recurrence.",
)
def stream_ledger_balance_demo(spark, sf_dir):
    from ..streaming.stateful import streaming_ledger_balance

    return streaming_ledger_balance(spark, sf_dir)


@query(
    "stream_stream_left_outer_join",
    "streaming",
    oracle="""
    SELECT v.user_id,
           CAST(count(p.pt) AS BIGINT) AS n_matched_pairs,
           CAST(sum(CASE WHEN p.pt IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unmatched_views
    FROM (SELECT user_id, ts::TIMESTAMP AS vt FROM events
          WHERE event_type = 'view') v
    LEFT JOIN (SELECT user_id, ts::TIMESTAMP AS pt FROM events
               WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.pt > v.vt AND p.pt <= v.vt + INTERVAL 1 HOUR
    GROUP BY v.user_id
    """,
    description="LEFT OUTER stream-stream join (round 13): matched "
    "view->purchase pairs emit at match time, unmatched views emit "
    "null-padded via watermark state EVICTION — a sentinel batch "
    "advances both sides' watermarks past every real row's horizon so "
    "the trailing no-data micro-batch flushes deterministically; the aggregate must "
    "hash-match the batch left join exactly (a stranded-in-state view "
    "or a double-emitted pair shifts a count).",
)
def stream_stream_left_outer_join(spark, sf_dir):
    from ..streaming.demos import streaming_stream_stream_left_outer

    return streaming_stream_stream_left_outer(spark, sf_dir)


@query(
    "stream_stream_full_outer_join",
    "streaming",
    oracle="""
    SELECT coalesce(v.user_id, p.user_id) AS user_id,
           CAST(sum(CASE WHEN v.vt IS NOT NULL AND p.pt IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_matched_pairs,
           CAST(sum(CASE WHEN v.vt IS NOT NULL AND p.pt IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unmatched_views,
           CAST(sum(CASE WHEN v.vt IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unmatched_purchases
    FROM (SELECT user_id, ts::TIMESTAMP AS vt FROM events
          WHERE event_type = 'view') v
    FULL JOIN (SELECT user_id, ts::TIMESTAMP AS pt FROM events
               WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.pt > v.vt AND p.pt <= v.vt + INTERVAL 1 HOUR
    GROUP BY 1
    """,
    description="FULL OUTER stream-stream join (round 14, completing "
    "the family after inner + left outer): both sides' null-padded "
    "non-matches are watermark EVICTION decisions, flushed "
    "deterministically by the sentinel-advanced no-data batch; the aggregate must "
    "hash-match the batch full join exactly (a stranded view, a "
    "stranded purchase, or a double emit each shifts a count).",
)
def stream_stream_full_outer_join(spark, sf_dir):
    from ..streaming.demos import streaming_stream_stream_full_outer

    return streaming_stream_stream_full_outer(spark, sf_dir)


@query(
    "stream_sessionize_stateful",
    "streaming",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id,
               epoch_us(ts::TIMESTAMP) AS us,
               lag(epoch_us(ts::TIMESTAMP)) OVER
                 (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)
                 AS prev_us
        FROM events
    ), flagged AS (
        SELECT user_id, event_id, us,
               CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM ordered
    ), sessions AS (
        SELECT user_id, us,
               CAST(sum(is_new) OVER
                 (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT)
                 AS session_id
        FROM flagged
    ), per AS (
        SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n
        FROM sessions GROUP BY user_id, session_id
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(max(n) AS BIGINT) AS max_session_events
    FROM per GROUP BY user_id
    """,
    description="STATEFUL sessionization with EVENT-TIME TIMEOUT "
    "(round 14 — the applyInPandasWithState timeout surface): "
    "30-min-gap sessions close via watermark-driven state timeouts, "
    "flushed deterministically by the sentinel-advanced no-data "
    "batch; per-user "
    "session aggregates must hash-match the batch lag->cumsum "
    "sessionization exactly (a stranded open session, a double emit, "
    "or a timeout firing early each shifts a count).",
)
def stream_sessionize_stateful(spark, sf_dir):
    from ..streaming.stateful import streaming_sessionize_stateful

    return streaming_sessionize_stateful(spark, sf_dir)
