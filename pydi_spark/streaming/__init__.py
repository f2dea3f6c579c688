from pydi_spark.streaming.health import streaming_health
from pydi_spark.streaming.dedup import (
    sessionize,
    stream_static_enrich,
    stream_stream_join,
    streaming_dedup,
    compact_signature_store,
    streaming_incremental_dedup,
    windowed_distinct_users,
    windowed_event_counts,
)

__all__ = [
    "sessionize",
    "stream_static_enrich",
    "stream_stream_join",
    "streaming_dedup",
    "compact_signature_store",
    "streaming_health",
    "streaming_incremental_dedup",
    "windowed_distinct_users",
    "windowed_event_counts",
]
