"""Regex extraction: generated projections.

Reference: RegexExtractor (PyDI/informationextraction/regex.py:16-248):
rules {field: {source_column, pattern(s), flags, group, postprocess}},
first match wins across the pattern list, optional postprocess.

Spark shape: ``coalesce(regexp_extract(...), ...)`` chains + postprocess
expressions — the whole extractor is one projection; Java regexes are
compiled once per task by codegen.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pydi_spark.core.dataset import Dataset, as_dataframe


def _one_pattern(src: Column, pattern: str, group: int, case_insensitive: bool) -> Column:
    pat = f"(?i){pattern}" if case_insensitive else pattern
    hit = F.regexp_extract(src.cast("string"), pat, group)
    return F.nullif(hit, F.lit(""))


@dataclass
class RegexExtractor:
    """rules: {field: spec}; spec keys: source_column, pattern | patterns,
    group (default 1), case_insensitive, postprocess (name from
    TRANSFORMATIONS or Column->Column callable)."""

    rules: dict[str, dict] = field(default_factory=dict)

    def extract(self, data: Dataset | DataFrame, source_column: str | None = None) -> DataFrame:
        df = as_dataframe(data)
        out = df
        for fieldname, spec in self.rules.items():
            src = F.col(spec.get("source_column") or source_column)
            patterns = spec.get("patterns") or [spec["pattern"]]
            group = int(spec.get("group", 1))
            ci = bool(spec.get("case_insensitive", False))
            col = F.coalesce(
                *[_one_pattern(src, p, group, ci) for p in patterns]
            )
            post = spec.get("postprocess")
            if post is not None:
                col = apply_postprocess(col, post)
            out = out.withColumn(fieldname, col)
        return out


def apply_postprocess(col: Column, post: Any) -> Column:
    from pydi_spark.extraction.rules import TRANSFORMATIONS

    if isinstance(post, str):
        if post not in TRANSFORMATIONS:
            raise ValueError(f"unknown postprocess '{post}'")
        return TRANSFORMATIONS[post](col)
    if callable(post):
        return post(col)
    raise ValueError(f"bad postprocess: {post!r}")
