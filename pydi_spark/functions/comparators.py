"""Attribute comparators: declarative Column builders for pair scoring.

Reference: PyDI/entitymatching/comparators.py — StringComparator (:16-240),
NumericComparator (:243-430), DateComparator (:433-615), each with
list-valued strategies (:142-224). There, comparators are Python callables
invoked per record pair; here each comparator *compiles to a Column
expression* over the joined pair table, so scoring runs JVM-side inside
whole-stage codegen. List strategies map to array expressions
(array_min/max, transform, aggregate) — no Python in the loop.

Usage: ``cmp.expr(F.col("l.title"), F.col("r.title"))`` -> Column in [0,1].
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from pydi_spark.functions.similarity import (
    best_match_similarity,
    similarity,
    token_similarity,
)


def _preprocess(col: Column, steps: str | list[str] | None) -> Column:
    """Named preprocessors (reference: utils/__init__.py:106-120)."""
    if steps is None:
        return col
    if isinstance(steps, str):
        steps = [steps]
    for s in steps:
        if s == "lowercase":
            col = F.lower(col)
        elif s == "strip":
            col = F.trim(col)
        elif s == "remove_punctuation":
            col = F.regexp_replace(col, r"[^\p{L}\p{N}\s]", "")
        elif s == "normalize_whitespace":
            col = F.trim(F.regexp_replace(col, r"\s+", " "))
        else:
            raise ValueError(f"unknown preprocess step: {s}")
    return col


class BaseComparator:
    """A comparator declares the attribute it scores and compiles to a
    Column. ``column`` is the attribute name present on both sides."""

    column: str

    def expr(self, left: Column, right: Column) -> Column:  # pragma: no cover
        raise NotImplementedError


@dataclass
class StringComparator(BaseComparator):
    """String similarity (reference: comparators.py:16-240).

    ``list_strategy`` handles ArrayType cells:
    concatenate | best_match | set_jaccard | set_overlap (:142-224).
    Nulls score null (excluded / treated as 0 by the matcher).
    """

    column: str
    similarity_function: str | Callable[[str, str], float] = "levenshtein"
    tokenization: str | None = None
    preprocess: str | list[str] | None = None
    list_strategy: str | None = None

    def expr(self, left: Column, right: Column) -> Column:
        if self.list_strategy is None:
            a = _preprocess(left, self.preprocess)
            b = _preprocess(right, self.preprocess)
            return similarity(self.similarity_function, a, b, self.tokenization)
        return self._list_expr(left, right)

    def _list_expr(self, left: Column, right: Column) -> Column:
        strat = self.list_strategy
        if strat == "concatenate":
            a = _preprocess(F.array_join(left, " "), self.preprocess)
            b = _preprocess(F.array_join(right, " "), self.preprocess)
            return similarity(self.similarity_function, a, b, self.tokenization)
        if strat == "set_jaccard":
            return token_similarity("jaccard", left, right)
        if strat == "set_overlap":
            return token_similarity("overlap", left, right)
        if strat == "best_match":
            # max pairwise similarity; native metrics compose inside
            # transform lambdas (JVM-side), python metrics/callables run
            # as one Arrow-batched UDF over both arrays
            return best_match_similarity(
                self.similarity_function, left, right, self.tokenization
            )
        raise ValueError(f"unknown list_strategy: {strat}")


@dataclass
class NumericComparator(BaseComparator):
    """Numeric similarity (reference: comparators.py:243-430; math :405-430).

    method: absolute_difference -> max(0, 1 - |a-b|/max_difference), or
    1/(1+|a-b|) when no max_difference; relative_difference ->
    1 - |a-b|/max(|a|,|b|); within_range -> indicator |a-b| <= max_difference.
    """

    column: str
    method: str = "absolute_difference"
    max_difference: float | None = None
    list_strategy: str | None = None

    def _scalar(self, a: Column, b: Column) -> Column:
        diff = F.abs(a - b)
        if self.method == "absolute_difference":
            if self.max_difference is not None:
                sim = F.greatest(F.lit(0.0), F.lit(1.0) - diff / F.lit(float(self.max_difference)))
            else:
                sim = F.lit(1.0) / (F.lit(1.0) + diff)
        elif self.method == "relative_difference":
            denom = F.greatest(F.abs(a), F.abs(b))
            sim = F.when(denom == 0, F.lit(1.0)).otherwise(
                F.greatest(F.lit(0.0), F.lit(1.0) - diff / denom)
            )
        elif self.method == "within_range":
            if self.max_difference is None:
                raise ValueError("within_range requires max_difference")
            sim = (diff <= F.lit(float(self.max_difference))).cast("double")
        else:
            raise ValueError(f"unknown method: {self.method}")
        return F.when(a.isNull() | b.isNull(), F.lit(None).cast("double")).otherwise(sim)

    def expr(self, left: Column, right: Column) -> Column:
        a = left.cast("double") if self.list_strategy is None else left
        b = right.cast("double") if self.list_strategy is None else right
        if self.list_strategy is None:
            return self._scalar(a, b)
        strat = self.list_strategy
        da = F.transform(left, lambda x: x.cast("double"))
        db = F.transform(right, lambda x: x.cast("double"))
        if strat == "average":
            mean = lambda arr: F.aggregate(  # noqa: E731
                arr, F.lit(0.0), lambda acc, x: acc + x
            ) / F.size(arr)
            return self._scalar(mean(da), mean(db))
        if strat == "best_match":
            sims = F.flatten(
                F.transform(da, lambda x: F.transform(db, lambda y: self._scalar(x, y)))
            )
            return F.array_max(sims)
        if strat == "range_overlap":
            lo = F.greatest(F.array_min(da), F.array_min(db))
            hi = F.least(F.array_max(da), F.array_max(db))
            span = F.greatest(F.array_max(da), F.array_max(db)) - F.least(
                F.array_min(da), F.array_min(db)
            )
            return F.when(span == 0, F.lit(1.0)).otherwise(
                F.greatest(F.lit(0.0), (hi - lo) / span)
            )
        if strat == "set_jaccard":
            return token_similarity("jaccard", left.cast("array<string>"),
                                    right.cast("array<string>"))
        raise ValueError(f"unknown list_strategy: {strat}")


@dataclass
class DateComparator(BaseComparator):
    """Date similarity (reference: comparators.py:433-615): day-difference
    -> 1 - diff/max_days_difference (clamped), or 1/(1+diff) without a max."""

    column: str
    max_days_difference: float | None = None
    list_strategy: str | None = None

    def _scalar(self, a: Column, b: Column) -> Column:
        diff = F.abs(F.datediff(a.cast("date"), b.cast("date"))).cast("double")
        if self.max_days_difference is not None:
            sim = F.greatest(
                F.lit(0.0), F.lit(1.0) - diff / F.lit(float(self.max_days_difference))
            )
        else:
            sim = F.lit(1.0) / (F.lit(1.0) + diff)
        return F.when(a.isNull() | b.isNull(), F.lit(None).cast("double")).otherwise(sim)

    def expr(self, left: Column, right: Column) -> Column:
        if self.list_strategy is None:
            return self._scalar(left, right)
        strat = self.list_strategy
        da = F.transform(left, lambda x: x.cast("date"))
        db = F.transform(right, lambda x: x.cast("date"))
        if strat == "closest_dates" or strat == "best_match":
            sims = F.flatten(
                F.transform(da, lambda x: F.transform(db, lambda y: self._scalar(x, y)))
            )
            return F.array_max(sims)
        if strat == "latest_dates":
            return self._scalar(F.array_max(da), F.array_max(db))
        if strat == "earliest_dates":
            return self._scalar(F.array_min(da), F.array_min(db))
        if strat == "average_dates":
            to_num = lambda arr: F.aggregate(  # noqa: E731
                F.transform(arr, lambda x: F.unix_date(x).cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ) / F.size(arr)
            diff = F.abs(to_num(da) - to_num(db))
            if self.max_days_difference is not None:
                return F.greatest(
                    F.lit(0.0),
                    F.lit(1.0) - diff / F.lit(float(self.max_days_difference)),
                )
            return F.lit(1.0) / (F.lit(1.0) + diff)
        if strat == "range_overlap":
            lo = F.greatest(F.array_min(da), F.array_min(db))
            hi = F.least(F.array_max(da), F.array_max(db))
            span = F.datediff(
                F.greatest(F.array_max(da), F.array_max(db)),
                F.least(F.array_min(da), F.array_min(db)),
            ).cast("double")
            inter = F.datediff(hi, lo).cast("double")
            return F.when(span == 0, F.lit(1.0)).otherwise(
                F.greatest(F.lit(0.0), inter / span)
            )
        raise ValueError(f"unknown list_strategy: {strat}")


def year_within(column: str, years: float) -> "DateComparator":
    """Reference's ``utils.date_within_years`` (utils/__init__.py:71-103)."""
    return DateComparator(column=column, max_days_difference=365.25 * years)
