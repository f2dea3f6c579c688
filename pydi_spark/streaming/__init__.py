from pydi_spark.streaming.dedup import (
    sessionize,
    streaming_dedup,
    windowed_event_counts,
)

__all__ = ["sessionize", "streaming_dedup", "windowed_event_counts"]
