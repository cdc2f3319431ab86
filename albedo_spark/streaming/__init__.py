from albedo_spark.streaming.events import (
    read_event_stream,
    session_window_agg,
    user_ewma_stream,
    windowed_event_counts,
)

__all__ = [
    "read_event_stream",
    "session_window_agg",
    "user_ewma_stream",
    "windowed_event_counts",
]
