"""Vectorized column transforms as native expressions.

Reference: PyDI/normalization/transforms.py:26-113 — lower, upper, strip,
normalize_whitespace, drop_non_ascii, to_numeric (thousands separators),
to_datetime, fill_na, replace, regex_replace, map(func); registry
BUILTIN_TRANSFORMS (:103-113). Each maps 1:1 onto a Column expression;
``map`` (arbitrary callable) goes through a pandas UDF.
"""

from __future__ import annotations

from typing import Any, Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def lower(c: Column) -> Column:
    return F.lower(c)


def upper(c: Column) -> Column:
    return F.upper(c)


def strip(c: Column) -> Column:
    return F.trim(c)


def normalize_whitespace(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def drop_non_ascii(c: Column) -> Column:
    return F.regexp_replace(c, r"[^\x00-\x7F]", "")


def to_numeric(c: Column) -> Column:
    """Strip thousands separators / currency / spaces then cast
    (reference: transforms.py:61-69)."""
    cleaned = F.regexp_replace(c.cast("string"), r"[,\s$€£]", "")
    return (cleaned).try_cast("double")


def to_datetime(c: Column, formats: list[str] | None = None) -> Column:
    """First-parseable-format datetime (reference to_datetime)."""
    formats = formats or [
        "yyyy-MM-dd'T'HH:mm:ss", "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd",
        "dd.MM.yyyy", "MM/dd/yyyy", "dd/MM/yyyy", "yyyyMMdd",
    ]
    s = F.trim(c.cast("string"))
    out = F.lit(None).cast("timestamp")
    for fmt in reversed(formats):
        out = F.coalesce(F.try_to_timestamp(s, F.lit(fmt)), out)
    return out


def fill_na(c: Column, value: Any) -> Column:
    return F.coalesce(c, F.lit(value))


def replace(c: Column, mapping: dict[str, Any]) -> Column:
    out = c
    for k, v in mapping.items():
        out = F.when(c.cast("string") == str(k), F.lit(v)).otherwise(out)
    return out


def regex_replace(c: Column, pattern: str, replacement: str = "") -> Column:
    return F.regexp_replace(c, pattern, replacement)


def map_fn(c: Column, fn: Callable[[Any], Any]) -> Column:
    """Arbitrary Python callable -> pandas UDF (the parity escape hatch,
    reference transforms.py:97-99)."""

    @F.pandas_udf(StringType())
    def apply(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else fn(v)).astype("string")

    return apply(c)


BUILTIN_TRANSFORMS: dict[str, Callable[..., Column]] = {
    "lower": lower,
    "upper": upper,
    "strip": strip,
    "normalize_whitespace": normalize_whitespace,
    "drop_non_ascii": drop_non_ascii,
    "to_numeric": to_numeric,
    "to_datetime": to_datetime,
    "fill_na": fill_na,
    "replace": replace,
    "regex_replace": regex_replace,
    "map": map_fn,
}


def transform_expr(col: Column | str, spec: Any) -> Column:
    """Resolve one transform spec: name | (name, args...) | callable."""
    c = F.col(col) if isinstance(col, str) else col
    if callable(spec) and not isinstance(spec, str):
        return map_fn(c, spec)
    if isinstance(spec, str):
        name, args = spec, ()
    elif isinstance(spec, (tuple, list)):
        name, *args = spec
    else:
        raise ValueError(f"bad transform spec: {spec!r}")
    if name not in BUILTIN_TRANSFORMS:
        raise ValueError(f"unknown transform '{name}'; known: {sorted(BUILTIN_TRANSFORMS)}")
    return BUILTIN_TRANSFORMS[name](c, *args)
