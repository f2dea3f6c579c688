"""Sinks: distributed writers + driver-side artifact helpers.

Reference sinks: per-blocker debug CSVs (blocking/standard.py:132-154 etc.),
evaluation JSON/CSV artifacts (entitymatching/evaluation.py:222-233),
fusion debug JSONL (fusion/engine.py:257-354). All become ``df.write``.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame

from pydi_spark.core.dataset import Dataset, as_dataframe


def write_parquet(data: Dataset | DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    w = as_dataframe(data).write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(data: Dataset | DataFrame, path: str, mode: str = "overwrite",
              header: bool = True) -> None:
    as_dataframe(data).write.mode(mode).option("header", header).csv(path)


def write_json(data: Dataset | DataFrame, path: str, mode: str = "overwrite") -> None:
    as_dataframe(data).write.mode(mode).json(path)


def write_orc(data: Dataset | DataFrame, path: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
    w = as_dataframe(data).write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_artifact(obj: Any, path: str) -> None:
    """Driver-side JSON artifact (evaluation summaries, cluster reports)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        json.dump(obj, fh, indent=2, default=str)
