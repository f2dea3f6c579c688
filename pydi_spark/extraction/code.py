"""Code extraction: user Python callables over values or rows.

Reference: CodeExtractor (PyDI/informationextraction/code.py:14-281):
functions {field: callable(value) | {function, source_column}} with
text- or row-based modes. Spark shape: Arrow-batched pandas UDFs; the
row-based mode passes a struct of the requested columns.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from pydi_spark.core.dataset import Dataset, as_dataframe


def _value_udf(fn: Callable[[Any], Any]):
    @F.pandas_udf(StringType())
    def apply(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else _str_or_none(fn(v))).astype(
            "string"
        )

    return apply


def _row_udf(fn: Callable[[dict], Any]):
    @F.pandas_udf(StringType())
    def apply(s: pd.DataFrame) -> pd.Series:
        return s.apply(
            lambda row: _str_or_none(fn(row.to_dict())), axis=1
        ).astype("string")

    return apply


def _str_or_none(v: Any) -> str | None:
    return None if v is None else str(v)


@dataclass
class CodeExtractor:
    """functions: {field: callable | {"function": fn, "source_column": col}
    | {"function": fn, "row_based": True, "columns": [...]}}."""

    functions: dict[str, Any] = field(default_factory=dict)

    def extract(self, data: Dataset | DataFrame, source_column: str | None = None) -> DataFrame:
        df = as_dataframe(data)
        out = df
        for fieldname, spec in self.functions.items():
            if callable(spec):
                fn, src, row_based, cols = spec, source_column, False, None
            else:
                fn = spec["function"]
                src = spec.get("source_column") or source_column
                row_based = bool(spec.get("row_based"))
                cols = spec.get("columns")
            if row_based:
                struct = F.struct(*[F.col(c) for c in (cols or df.columns)])
                out = out.withColumn(fieldname, _row_udf(fn)(struct))
            else:
                if src is None:
                    raise ValueError(f"{fieldname}: needs source_column")
                out = out.withColumn(fieldname, _value_udf(fn)(F.col(src)))
        return out
