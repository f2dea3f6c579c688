"""Unique-ID injection for entity tables.

Reference semantics (PyDI/io/loaders.py:127-176): every loaded dataset gets
a synthetic string ID column ``{name}_id`` with zero-padded values
``"{prefix}-0007"``. Here the ID is computed distributedly:

- ``deterministic=True`` -> global ``row_number`` over an explicit ordering
  (one narrow shuffle of only the ordering keys via range partitioning —
  Spark's sort-based row_number; reproducible, oracle-checkable).
- ``deterministic=False`` -> ``monotonically_increasing_id`` (no shuffle at
  all; unique but not dense — the right default at 100 TB when the caller
  only needs uniqueness).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def add_id_column(
    df: DataFrame,
    prefix: str,
    id_column: str | None = None,
    order_by: list[str] | None = None,
    pad: int = 4,
    deterministic: bool = True,
) -> tuple[DataFrame, str]:
    """Inject a unique string id column ``{prefix}-{i:0{pad}d}``.

    Returns ``(df_with_id, id_column_name)``. When ``order_by`` is None and
    deterministic ids are requested, orders by all existing columns (stable
    for deterministic inputs).
    """
    id_column = id_column or f"{prefix}_id"
    if id_column in df.columns:
        return df, id_column
    if deterministic:
        # distributed global rank (functions.ranks): a bare
        # Window.orderBy would funnel the dataset through ONE partition
        from pydi_spark.functions.ranks import global_row_number

        keys = order_by or df.columns
        ranked = global_row_number(df, keys, out_col="__rn")
        value = F.format_string(f"{prefix}-%0{pad}d", F.col("__rn") - F.lit(1))
        return ranked.withColumn(id_column, value).drop("__rn"), id_column
    idx = F.monotonically_increasing_id()
    value = F.format_string(f"{prefix}-%0{pad}d", idx)
    return df.withColumn(id_column, value), id_column


def id_format_expr(prefix: str, index_col: Column, pad: int = 4) -> Column:
    """Column expression for the reference's zero-padded id format."""
    return F.format_string(f"{prefix}-%0{pad}d", index_col)
