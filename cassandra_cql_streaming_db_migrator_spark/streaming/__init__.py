from .stream import (
    read_events_stream,
    run_to_memory,
    streaming_dedup_counts,
    tumbling_window_agg,
)

__all__ = [
    "read_events_stream",
    "run_to_memory",
    "streaming_dedup_counts",
    "tumbling_window_agg",
]
