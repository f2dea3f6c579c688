"""LLM call-record capture: per-call prompt/response/usage logging.

Reference parity: ``LLMCallRecord`` / ``LLMCallLogger``
(PyDI/utils/llm.py:88-212) — the reference records every chat call
(timestamp, attempt, model, duration, usage, request preview, response
preview) into a driver-side list and flushes ``llm_calls.json`` +
``llm_usage_summary.json`` artifacts (entitymatching/llm_based.py:72,
213-214; informationextraction/base.py:108-160).

Spark shape: a driver-side list cannot capture calls made inside
executor tasks, so records are carried as DATA — each capture-enabled
stage emits an extra ``_llm_calls`` array<struct> column built inside
its ``mapInPandas`` batches, and the public ``*_with_log`` entry points
explode it into a call-log DataFrame. The scored frame is eagerly
checkpointed once so matches and log derive from the same inference run
(mapInPandas is not deterministic-replay safe with remote clients).
Previews are bounded (2000 chars, like the reference) so the log stays
O(#calls) with small rows at any corpus size.

Client contract: a client callable may return a plain completion string
(no usage available), or a ``(text, usage_dict)`` tuple / a dict with
``text``/``content`` and ``usage`` keys — the usage lands in the record
as a JSON string (provider-agnostic, like the reference's duck-typed
``_extract_usage_metadata``).
"""

from __future__ import annotations

import json
import time
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

PREVIEW_CHARS = 2000

CALL_RECORD_TYPE = StructType(
    [
        StructField("attempt", IntegerType()),
        StructField("duration_ms", DoubleType()),
        StructField("prompt_preview", StringType()),
        StructField("response_preview", StringType()),
        StructField("usage_json", StringType()),
        StructField("error", StringType()),
    ]
)
CALL_LOG_COLUMN = "_llm_calls"
CALL_LOG_TYPE = ArrayType(CALL_RECORD_TYPE)


def unpack_response(raw: Any) -> tuple[str, str | None]:
    """(completion_text, usage_json) from a client return value."""
    if isinstance(raw, tuple) and len(raw) == 2:
        text, usage = raw
        return str(text), json.dumps(usage) if usage is not None else None
    if isinstance(raw, dict):
        text = raw.get("text", raw.get("content"))
        usage = raw.get("usage")
        return str(text), json.dumps(usage) if usage is not None else None
    return str(raw), None


class CallRecorder:
    """Accumulates per-call records inside one task; ``row()`` closes
    out the current row's records (the ``_llm_calls`` cell value)."""

    def __init__(self) -> None:
        self._current: list[dict] = []

    def call(self, client: Callable[[str], Any], prompt: str, attempt: int) -> str:
        """Invoke, record, and return the completion TEXT; exceptions
        are recorded (error field) and re-raised for the caller's retry
        loop."""
        t0 = time.time()
        try:
            raw = client(prompt)
        except Exception as exc:
            self._current.append(
                {
                    "attempt": attempt,
                    "duration_ms": (time.time() - t0) * 1000.0,
                    "prompt_preview": prompt[:PREVIEW_CHARS],
                    "response_preview": None,
                    "usage_json": None,
                    "error": f"{type(exc).__name__}: {str(exc)[:200]}",
                }
            )
            raise
        text, usage_json = unpack_response(raw)
        self._current.append(
            {
                "attempt": attempt,
                "duration_ms": (time.time() - t0) * 1000.0,
                "prompt_preview": prompt[:PREVIEW_CHARS],
                "response_preview": text[:PREVIEW_CHARS],
                "usage_json": usage_json,
                "error": None,
            }
        )
        return text

    def record_parse_error(self, exc: Exception) -> None:
        """Mark the most recent record as parse-failed (the call itself
        succeeded but its completion didn't parse)."""
        if self._current and self._current[-1]["error"] is None:
            self._current[-1]["error"] = (
                f"parse: {type(exc).__name__}: {str(exc)[:200]}"
            )

    def row(self) -> list[dict]:
        out, self._current = self._current, []
        return out


def explode_call_log(
    df: DataFrame, key_columns: list[str], stage: str
) -> DataFrame:
    """``_llm_calls`` array column -> one row per call, keyed by
    ``key_columns`` and tagged with the stage name."""
    return (
        df.select(*key_columns, F.explode(CALL_LOG_COLUMN).alias("_c"))
        .select(F.lit(stage).alias("stage"), *key_columns, "_c.*")
    )


def call_log_summary(log: DataFrame) -> DataFrame:
    """One-row usage roll-up of a call-log frame — the Spark analogue of
    the reference's ``llm_usage_summary.json`` (utils/llm.py:166-212):
    call/error counts, total duration, and token totals pulled from the
    provider-agnostic ``usage_json`` (both common provider key
    spellings, like the reference's multi-key fallback)."""
    in_tok = F.coalesce(
        F.get_json_object("usage_json", "$.input_tokens"),
        F.get_json_object("usage_json", "$.prompt_tokens"),
        F.lit("0"),
    ).cast("long")
    out_tok = F.coalesce(
        F.get_json_object("usage_json", "$.output_tokens"),
        F.get_json_object("usage_json", "$.completion_tokens"),
        F.lit("0"),
    ).cast("long")
    return log.agg(
        F.count("*").alias("total_calls"),
        F.count(F.col("error")).alias("n_errors"),
        F.round(F.sum("duration_ms"), 3).alias("total_duration_ms"),
        F.sum(in_tok).alias("total_input_tokens"),
        F.sum(out_tok).alias("total_output_tokens"),
        F.sum(in_tok + out_tok).alias("total_tokens"),
    )


def write_call_log_artifacts(log: DataFrame, out_dir: str) -> None:
    """Persist ``llm_calls.json`` + ``llm_usage_summary.json`` under
    ``out_dir`` — the reference's flush artifacts (utils/llm.py:166-185;
    informationextraction/base.py:143-160 writes them ALWAYS, not only
    in debug mode). Driver-side JSON like every reference artifact
    writer; the log frame is observability-sized by construction."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    records = [r.asDict(recursive=True) for r in log.collect()]
    with open(os.path.join(out_dir, "llm_calls.json"), "w") as fh:
        json.dump(records, fh, indent=2, default=str)
    summary = call_log_summary(log).collect()[0].asDict()
    with open(os.path.join(out_dir, "llm_usage_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2, default=str)
