"""Streaming observability: progress metrics a long-running ingest
pipeline must watch (Structured Streaming exposes them per micro-batch
via ``StreamingQueryProgress``; this condenses them into the handful an
operator alarms on).

At 100 TB-scale ingest the failure modes are silent: watermark stalls
(late files stop advancing event time), state-store growth (keys never
expire), and throughput collapse (processedRowsPerSecond falling behind
inputRowsPerSecond). None of these throw — they must be *read*.
"""

from __future__ import annotations

from typing import Any


def streaming_health(query) -> dict[str, Any]:
    """Condensed health snapshot of a ``StreamingQuery``.

    Returns a dict with:
      - ``batches``: number of progress events retained
      - ``input_rows`` / ``dropped_late_rows``: totals across retained
        progress (dropped-late = ``numRowsDroppedByWatermark`` — the
        watermark's discard counter; nonzero means late data is being
        lost and the watermark delay may be too tight)
      - ``state_rows`` / ``state_bytes``: last-batch stateful-operator
        footprint (monotone growth across snapshots = keys never
        expire; check TTL/watermark eviction)
      - ``watermark``: last event-time watermark (string; stalls mean
        event time stopped advancing)
      - ``avg_process_rate`` / ``avg_input_rate``: rows/sec across
        retained batches; process < input = falling behind
      - ``behind``: True when the input rate exceeds the processing
        rate over the retained window
    """
    progress = [p for p in (query.recentProgress or []) if p]
    out: dict[str, Any] = {
        "batches": len(progress),
        "input_rows": 0,
        "dropped_late_rows": 0,
        "state_rows": 0,
        "state_bytes": 0,
        "watermark": None,
        "avg_process_rate": 0.0,
        "avg_input_rate": 0.0,
        "behind": False,
    }
    if not progress:
        return out
    in_rates, proc_rates = [], []
    for p in progress:
        out["input_rows"] += int(p.get("numInputRows") or 0)
        in_rates.append(float(p.get("inputRowsPerSecond") or 0.0))
        proc_rates.append(float(p.get("processedRowsPerSecond") or 0.0))
        for so in p.get("stateOperators") or []:
            out["dropped_late_rows"] += int(
                so.get("numRowsDroppedByWatermark") or 0
            )
    last = progress[-1]
    for so in last.get("stateOperators") or []:
        out["state_rows"] += int(so.get("numRowsTotal") or 0)
        out["state_bytes"] += int(so.get("memoryUsedBytes") or 0)
    out["watermark"] = (last.get("eventTime") or {}).get("watermark")
    out["avg_input_rate"] = sum(in_rates) / len(in_rates)
    out["avg_process_rate"] = sum(proc_rates) / len(proc_rates)
    out["behind"] = (
        out["avg_input_rate"] > 0
        and out["avg_process_rate"] < 0.9 * out["avg_input_rate"]
    )
    return out
