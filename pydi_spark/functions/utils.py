"""Convenience comparator factories matching the reference's utils API.

Reference: PyDI/utils/__init__.py — ``jaccard(column)`` (:40-68),
``date_within_years(column, years)`` (:71-103), preprocessors
lowercase/strip/remove_punctuation (:106-120). Thin factories over the
engine's comparators so reference pipelines translate 1:1.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pydi_spark.functions.comparators import (
    DateComparator,
    StringComparator,
    year_within,
)


def jaccard(column: str, tokenization: str = "word") -> StringComparator:
    """Whitespace-token Jaccard comparator closure
    (reference: utils/__init__.py:40-68)."""
    return StringComparator(
        column=column, similarity_function="jaccard", tokenization=tokenization
    )


def date_within_years(column: str, years: float) -> DateComparator:
    """1 - yeardiff/years, clipped (reference: utils/__init__.py:71-103)."""
    return year_within(column, years)


def lowercase(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(c)


def strip(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(c)


def remove_punctuation(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[^\p{L}\p{N}\s]", "")
