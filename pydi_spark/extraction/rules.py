"""Built-in parse rules + rule discovery.

Reference: PyDI/informationextraction/rules.py (parse_money :12,
parse_number :20, parse_percent :28, parse_date :40, normalize_url :47,
extract_domain :55, parse_coordinate :63, parse_quantity :81,
parse_storage_gb :92, parse_power_w :121, parse_frequency_hz :147,
whitespace/strip/lowercase :173-187, parse_employee_count :194) and
RuleDiscovery.extract_and_select with a non-null coverage threshold
(autorules.py:17-456).

Each rule is a Column->Column expression builder; discovery = run every
candidate extraction + ONE coverage aggregate, keep fields above the
threshold.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pydi_spark.core.dataset import Dataset, as_dataframe
from pydi_spark.normalization.parsers import (
    extract_domain,
    normalize_url,
    parse_coordinate,
    parse_numeric,
    parse_percentage,
)
from pydi_spark.normalization.transforms import normalize_whitespace, to_datetime
from pydi_spark.normalization.units import parse_quantity_expr


def parse_money(c: Column) -> Column:
    amt = F.regexp_extract(c.cast("string"), r"[$€£]\s?([0-9][0-9,.]*)", 1)
    amt2 = F.regexp_extract(c.cast("string"), r"([0-9][0-9,.]*)\s?(?:USD|EUR|GBP)", 1)
    return (F.regexp_replace(F.coalesce(F.nullif(amt, F.lit("")),
                                                  F.nullif(amt2, F.lit(""))), ",", "")).try_cast("double")


def parse_number(c: Column) -> Column:
    return parse_numeric(
        F.nullif(F.regexp_extract(c.cast("string"), r"([+-]?[0-9][0-9,]*\.?[0-9]*)", 1), F.lit(""))
    )


def parse_percent(c: Column) -> Column:
    return parse_percentage(
        F.nullif(F.regexp_extract(c.cast("string"), r"([+-]?[0-9.]+\s?%)", 1), F.lit(""))
    )


def parse_date(c: Column) -> Column:
    return to_datetime(c)


def _unit_scaled(c: Column, pattern: str, scales: dict[str, float]) -> Column:
    num = (F.regexp_extract(c.cast("string"), pattern, 1)).try_cast("double")
    unit = F.lower(F.regexp_extract(c.cast("string"), pattern, 2))
    factor = F.lit(None).cast("double")
    for u, s in scales.items():
        factor = F.when(unit == u, F.lit(s)).otherwise(factor)
    return num * factor


def parse_storage_gb(c: Column) -> Column:
    """'512 MB' / '2TB' -> GB (reference: rules.py:92)."""
    return _unit_scaled(
        c, r"(?i)([0-9.]+)\s*(tb|gb|mb|kb)",
        {"kb": 1e-6, "mb": 1e-3, "gb": 1.0, "tb": 1e3},
    )


def parse_power_w(c: Column) -> Column:
    return _unit_scaled(c, r"(?i)([0-9.]+)\s*(kw|mw|w)\b",
                        {"w": 1.0, "kw": 1e3, "mw": 1e6})


def parse_frequency_hz(c: Column) -> Column:
    return _unit_scaled(c, r"(?i)([0-9.]+)\s*(ghz|mhz|khz|hz)",
                        {"hz": 1.0, "khz": 1e3, "mhz": 1e6, "ghz": 1e9})


def parse_employee_count(c: Column) -> Column:
    q = parse_quantity_expr(
        F.nullif(
            F.regexp_extract(
                F.lower(c.cast("string")),
                r"([0-9][0-9,.]*\s*(?:hundred|thousand|million|k)?)\s*(?:employees|staff|people)",
                1,
            ),
            F.lit(""),
        )
    )
    return q["value"]


def strip_text(c: Column) -> Column:
    return F.trim(c)


def lowercase_text(c: Column) -> Column:
    return F.lower(c)


TRANSFORMATIONS: dict[str, Callable[[Column], Column]] = {
    "parse_money": parse_money,
    "parse_number": parse_number,
    "parse_percent": parse_percent,
    "parse_date": parse_date,
    "normalize_url": normalize_url,
    "extract_domain": extract_domain,
    "parse_coordinate": parse_coordinate,
    "parse_storage_gb": parse_storage_gb,
    "parse_power_w": parse_power_w,
    "parse_frequency_hz": parse_frequency_hz,
    "parse_employee_count": parse_employee_count,
    "normalize_whitespace": normalize_whitespace,
    "strip_text": strip_text,
    "lowercase_text": lowercase_text,
}

# field -> (pattern, postprocess) candidates for discovery
BUILTIN_RULES: dict[str, tuple[str, str | None]] = {
    "money": (r"([$€£]\s?[0-9][0-9,.]*)", "parse_money"),
    "percent": (r"([+-]?[0-9.]+\s?%)", "parse_percent"),
    "date_iso": (r"([0-9]{4}-[0-9]{2}-[0-9]{2})", "parse_date"),
    "url": (r"((?:https?://|www\.)[^\s]+)", "normalize_url"),
    "email": (r"([A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,})", None),
    "storage": (r"(?i)([0-9.]+\s*(?:tb|gb|mb|kb))", "parse_storage_gb"),
    "frequency": (r"(?i)([0-9.]+\s*(?:ghz|mhz|khz|hz))", "parse_frequency_hz"),
    "power": (r"(?i)([0-9.]+\s*(?:kw|mw|w)\b)", "parse_power_w"),
    "number": (r"([+-]?[0-9][0-9,]*\.?[0-9]+)", "parse_number"),
}


class RuleDiscovery:
    """Run all built-in rules, keep fields whose non-null coverage >=
    threshold (reference: autorules.py:384-456)."""

    def __init__(self, coverage_threshold: float = 0.3):
        self.coverage_threshold = coverage_threshold

    def extract_and_select(
        self, data: Dataset | DataFrame, source_column: str
    ) -> tuple[DataFrame, dict[str, float]]:
        from pydi_spark.extraction.regex import RegexExtractor

        df = as_dataframe(data)
        rules = {
            f"x_{name}": {
                "source_column": source_column,
                "pattern": pat,
                "postprocess": post,
            }
            for name, (pat, post) in BUILTIN_RULES.items()
        }
        extracted = RegexExtractor(rules).extract(df)
        total = extracted.count()
        cov_row = extracted.agg(
            *[F.count(F.col(f)).alias(f) for f in rules]
        ).collect()[0]
        coverage = {f: (cov_row[f] / total if total else 0.0) for f in rules}
        keep = [f for f, c in coverage.items() if c >= self.coverage_threshold]
        return extracted.select(*df.columns, *keep), coverage
