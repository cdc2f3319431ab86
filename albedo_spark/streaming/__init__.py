from albedo_spark.streaming.events import (
    error_click_interval_join,
    read_event_stream,
    run_to_files,
    run_to_memory,
    session_window_agg,
    user_ewma_stream,
    windowed_event_counts,
)

__all__ = [
    "error_click_interval_join",
    "read_event_stream",
    "run_to_files",
    "run_to_memory",
    "session_window_agg",
    "user_ewma_stream",
    "windowed_event_counts",
]
