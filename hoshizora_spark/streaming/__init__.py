from hoshizora_spark.streaming.ingest import (
    stream_edges_from_text,
    streaming_degrees,
    windowed_event_counts,
)

__all__ = ["stream_edges_from_text", "streaming_degrees", "windowed_event_counts"]
