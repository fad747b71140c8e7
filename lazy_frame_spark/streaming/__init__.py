from lazy_frame_spark.streaming.sinks import (
    ParquetUpsertSink,
    kafka_message_frame,
    kafka_sink_writer,
)
from lazy_frame_spark.streaming.stateful import (
    running_topk,
    running_topk_tws,
    running_user_profile,
)
from lazy_frame_spark.streaming.windows import (
    dedup_within_watermark,
    run_stream_to_memory,
    session_window_agg,
    sliding_window_agg,
    stream_events,
    stream_static_enrich,
    stream_stream_time_join,
    tumbling_window_agg,
)

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "stream_events",
    "stream_stream_time_join",
    "stream_static_enrich",
    "dedup_within_watermark",
    "run_stream_to_memory",
    "running_user_profile",
    "running_topk",
    "running_topk_tws",
    "ParquetUpsertSink",
    "kafka_message_frame",
    "kafka_sink_writer",
]
