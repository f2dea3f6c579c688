"""Schema-aligned union of heterogeneous sources.

Multi-source integration constantly unions frames whose schemas drifted
— columns missing on one side, int-vs-long-vs-double width conflicts,
or a column that went stringly. ``align_and_union`` is the engine's
one-call answer: the output schema is the union of input columns in
first-seen order, each column widened to the least common type.

Widening lattice (deliberately small and predictable):
  integral widths -> long; any numeric mix (incl. decimal) -> double;
  identical types -> unchanged; anything else -> string.
Complex types (arrays/structs/maps) must match exactly or the call
fails — silently stringifying nested data hides bugs.

Scale shape: pure narrow work — per-input casts + unionByName, no
shuffle. The reference's loaders normalize per-file (PyDI
io/loaders.py); this is the cross-SOURCE complement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_NUMERIC = _INTEGRAL + (T.FloatType, T.DoubleType, T.DecimalType)


def _widen(a: T.DataType, b: T.DataType) -> T.DataType:
    if a == b:
        return a
    if isinstance(a, _INTEGRAL) and isinstance(b, _INTEGRAL):
        return T.LongType()
    if isinstance(a, _NUMERIC) and isinstance(b, _NUMERIC):
        return T.DoubleType()
    for t in (a, b):
        if isinstance(t, (T.ArrayType, T.StructType, T.MapType)):
            raise ValueError(
                f"complex types must match exactly, got {a} vs {b}"
            )
    return T.StringType()


def align_and_union(
    dfs: list[DataFrame],
    source_col: str | None = None,
    source_names: list[str] | None = None,
) -> DataFrame:
    """Union ``dfs`` on the merged, type-widened schema.

    ``source_col`` (optional) appends a lineage column; its values are
    ``source_names`` (default ``"0", "1", ...``).
    """
    if not dfs:
        raise ValueError("no frames to union")
    merged: dict[str, T.DataType] = {}
    for df in dfs:
        for f in df.schema.fields:
            merged[f.name] = (
                _widen(merged[f.name], f.dataType)
                if f.name in merged else f.dataType
            )
    out_cols = list(merged)
    parts = []
    for i, df in enumerate(dfs):
        have = set(df.columns)
        cols = [
            (F.col(c).cast(merged[c]) if c in have
             else F.lit(None).cast(merged[c])).alias(c)
            for c in out_cols
        ]
        if source_col is not None:
            name = (
                source_names[i] if source_names is not None else str(i)
            )
            cols.append(F.lit(name).alias(source_col))
        parts.append(df.select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
