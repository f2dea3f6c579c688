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


def write_excel(
    sheets: "dict[str, Dataset | DataFrame]", path: str
) -> None:
    """Driver-side multi-sheet xlsx sink (the write twin of
    ``load_excel``; reference exports via pandas ``to_excel``). Uses
    the pure-stdlib SpreadsheetML codec (io/xlsx.py) — no openpyxl
    needed. Collects each frame: xlsx is a small-file interchange
    format, same contract as load_excel/load_html."""
    from pydi_spark.io.xlsx import write_xlsx

    payload = {}
    for name, data in sheets.items():
        df = as_dataframe(data)
        payload[name] = (list(df.columns),
                         [list(r) for r in df.collect()])
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    write_xlsx(path, payload)


def write_html_page(
    tables: "dict[str, Dataset | DataFrame]", path: str
) -> None:
    """Driver-side HTML page with one ``<table>`` per frame (the write
    twin of ``load_html``)."""
    from pydi_spark.io.htmltables import html_table

    parts = ["<html><body>"]
    for name, data in tables.items():
        df = as_dataframe(data)
        parts.append(f"<h2>{name}</h2>")
        parts.append(html_table(list(df.columns),
                                [list(r) for r in df.collect()]))
    parts.append("</body></html>")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("".join(parts))


def write_artifact(obj: Any, path: str) -> None:
    """Driver-side JSON artifact (evaluation summaries, cluster reports)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        json.dump(obj, fh, indent=2, default=str)


def write_training_shards(
    data: Dataset | DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    order_col: str | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """The pipeline's final sink: deterministic sharded output for a
    training loader. Each row lands in ``shard = floor(md5_fraction(key)
    * n_shards)`` — stable across runs AND input partitionings, unlike
    ``repartition(n)``/``df.randomSplit`` whose assignment depends on
    the upstream layout — and each shard directory is written with its
    rows ordered by ``order_col`` (pack order, curriculum order).

    Scale shape: ONE shuffle keyed on the shard id; a resumable loader
    addresses shards by directory (``shard=<i>/``); re-running the job
    reproduces byte-identical shard membership, so a partially consumed
    run can be resumed against a rewrite."""
    from pyspark.sql import functions as F

    from pydi_spark.llmdata.sampling import hash_fraction

    df = as_dataframe(data).withColumn(
        "shard",
        F.floor(hash_fraction(F.col(key_col)) * F.lit(int(n_shards))).cast("int"),
    )
    df = df.repartition(int(n_shards), "shard")
    if order_col:
        df = df.sortWithinPartitions("shard", order_col)
    df.write.mode(mode).partitionBy("shard").format(fmt).save(path)
