"""Extractor pipeline: chained lazy projections.

Reference: ExtractorPipeline (PyDI/informationextraction/base.py:215-268).
Chaining extractors composes withColumn projections — Catalyst collapses
them into one stage. ``run(..., artifacts_dir=...)`` is the analogue of
BaseExtractor's artifact writer (base.py:108-160): per-extractor config
JSON always, plus ``llm_calls.json``/``llm_usage_summary.json`` for
extractors that capture LLM calls (``extract_with_log``).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from pydi_spark.core.dataset import Dataset, as_dataframe


def _extractor_config(ex) -> dict:
    """JSON-safe snapshot of an extractor's public configuration — the
    reference persists 'config.json' per run (base.py:186-213)."""
    cfg = {"extractor_class": type(ex).__name__}
    for k, v in sorted(vars(ex).items()):
        if k.startswith("_"):
            continue
        if isinstance(v, (str, int, float, bool, type(None), list, dict)):
            cfg[k] = v
        else:
            cfg[k] = repr(v)
    return cfg


@dataclass
class ExtractorPipeline:
    extractors: list = field(default_factory=list)

    def run(
        self,
        data: Dataset | DataFrame,
        source_column: str | None = None,
        artifacts_dir: str | None = None,
    ) -> DataFrame:
        df = as_dataframe(data)
        for i, ex in enumerate(self.extractors):
            step_dir = None
            if artifacts_dir is not None:
                step_dir = os.path.join(
                    artifacts_dir, f"{i:02d}_{type(ex).__name__}"
                )
                os.makedirs(step_dir, exist_ok=True)
                with open(os.path.join(step_dir, "config.json"), "w") as fh:
                    json.dump(_extractor_config(ex), fh, indent=2)
            if step_dir is not None and hasattr(ex, "extract_with_log"):
                from pydi_spark.core.llmcalls import write_call_log_artifacts

                df, log = ex.extract_with_log(df, source_column)
                write_call_log_artifacts(log, step_dir)
            else:
                df = ex.extract(df, source_column)
        return df
