"""Structured Streaming surface: unified batch/stream window builders,
file-stream source helpers, custom stateful operators."""

from bigdatamlteamrepo_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
    session_counts,
    sliding_counts,
    tumbling_counts,
)
from bigdatamlteamrepo_spark.streaming.stateful import user_running_totals

__all__ = [
    "read_events_stream",
    "run_stream_to_memory",
    "session_counts",
    "sliding_counts",
    "tumbling_counts",
    "user_running_totals",
]
