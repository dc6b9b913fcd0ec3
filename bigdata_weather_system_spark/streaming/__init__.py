from .pipeline import (
    read_event_stream,
    streaming_dedup,
    stream_stream_interval_join,
    start_memory_sink,
    start_parquet_sink,
    start_incremental_snapshot_sink,
    streaming_session_profile,
    read_latest_snapshot,
    compact_snapshot,
    streaming_hourly_profile,
)
from .stateful import running_value_profile, running_value_profile_tws

__all__ = [
    "read_event_stream",
    "streaming_dedup",
    "stream_stream_interval_join",
    "start_memory_sink",
    "start_parquet_sink",
    "start_incremental_snapshot_sink",
    "streaming_session_profile",
    "read_latest_snapshot",
    "compact_snapshot",
    "streaming_hourly_profile",
    "running_value_profile",
    "running_value_profile_tws",
]
