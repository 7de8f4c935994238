"""Structured Streaming operators — the engine's incremental path.

The reference's incremental substance was slice checkpointing +
task-queue retry (slice.go cursors, SURVEY §2.A A9); Spark's analogue
is the checkpoint WAL + state store behind every streaming query.
"""

from .demos import (  # noqa: F401
    replay_events_stream,
    streaming_dedup,
    streaming_foreach_batch_etl,
    streaming_sliding,
    streaming_static_join,
    streaming_stream_stream_join,
    streaming_tumbling,
)
from .stateful import streaming_user_totals  # noqa: F401
