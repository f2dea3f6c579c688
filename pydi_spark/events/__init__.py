from pydi_spark.events.ops import (
    assign_sessions,
    event_path_ngrams,
    funnel_stages,
    resample_timeseries,
    retention_cohorts,
    session_stats,
)

__all__ = [
    "assign_sessions",
    "event_path_ngrams",
    "funnel_stages",
    "resample_timeseries",
    "retention_cohorts",
    "session_stats",
]
