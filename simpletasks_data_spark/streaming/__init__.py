from .ingest import (
    events_schema,
    stream_events,
    streaming_dedupe,
    streaming_hourly_counts,
    streaming_interval_join,
    streaming_lsh_dedup,
    streaming_merge_into,
    streaming_sessions,
)
from .stateful import capped_sessions_batch, capped_sessions_stateful, running_totals_stateful

__all__ = [
    "events_schema",
    "stream_events",
    "streaming_dedupe",
    "streaming_hourly_counts",
    "streaming_interval_join",
    "streaming_sessions",
    "streaming_lsh_dedup",
    "streaming_merge_into",
    "capped_sessions_batch",
    "capped_sessions_stateful",
    "running_totals_stateful",
]
