from lazy_frame_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    stream_events,
    tumbling_window_agg,
)

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "stream_events",
]
