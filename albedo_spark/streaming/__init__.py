from albedo_spark.streaming.events import (
    read_event_stream,
    session_window_agg,
    windowed_event_counts,
)

__all__ = ["read_event_stream", "session_window_agg", "windowed_event_counts"]
