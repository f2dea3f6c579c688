from pydi_spark.events.ops import (
    active_users,
    assign_sessions,
    attribute_conversions,
    cohort_value,
    event_cooccurrence,
    event_path_ngrams,
    bot_report,
    experiment_report,
    funnel_stages,
    new_users_curve,
    resample_timeseries,
    retention_cohorts,
    rfm_segments,
    session_entry_exit,
    session_stats,
)

# The streaming twin of assign_sessions/session_stats: gap-based
# session windows via F.session_window, runnable unchanged as a batch
# plan (how the oracle checks it) or a Structured Streaming query.
# Re-exported here so batch AND stream sessionization are discoverable
# from the one events package; boundary semantics agree except at an
# exact gap==limit tie (session_window splits at >=, the lag path at
# >), pinned by tests/test_extraction_profiling.py
# test_batch_stream_sessionize_parity.
from pydi_spark.streaming.dedup import sessionize as sessionize_stream

__all__ = [
    "active_users",
    "assign_sessions",
    "attribute_conversions",
    "cohort_value",
    "event_cooccurrence",
    "event_path_ngrams",
    "bot_report",
    "experiment_report",
    "funnel_stages",
    "new_users_curve",
    "resample_timeseries",
    "retention_cohorts",
    "rfm_segments",
    "session_entry_exit",
    "session_stats",
    "sessionize_stream",
]
