from mimir_spark.streaming.jobs import (
    streaming_wordcount,
    streaming_event_windows,
    streaming_sessionize,
)

__all__ = [
    "streaming_wordcount",
    "streaming_event_windows",
    "streaming_sessionize",
]
