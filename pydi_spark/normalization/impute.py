"""Missing-value imputation — mean / median / mode / constant, global
or per-group, with the engine's cross-engine determinism contract.

Reference scope: PyDI's normalization fills values only through the
typed parsers and FD repair (normalization/repair.py); it has no
statistical imputer. This is the standard completion step a fusion /
training-data pipeline needs before numeric comparators or models see
the column — a north-star addition, designed Spark-first:

- every statistic is ONE map-side-combinable aggregation over the
  input (mean: exact decimal sums; median: value-histogram cumsum
  bounded by column cardinality; mode: counts under a total order);
- the group-statistics frame is output-sized (|groups| rows) and joins
  back broadcast-eligible; a global fill is a 1-row broadcast;
- NO float accumulation anywhere: the mean is a single IEEE division
  of exact operands (keep each stored decimal sum below 2^53 — pick
  ``scale`` to the column's actual decimals, NOTES.md round-6 lesson),
  the median is percentile_disc semantics (an element, never an
  interpolation), and mode ties break (count DESC, value ASC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_STRATEGIES = ("mean", "median", "mode")


def _fill_frame(
    df: DataFrame,
    col: str,
    strategy: str,
    group_by: list[str],
    scale: int,
) -> DataFrame:
    """[*group_by, __fill] — one statistic per group (or one row)."""
    grouped = df.groupBy(*[F.col(g) for g in group_by])
    if strategy == "mean":
        dec = f"decimal(18,{int(scale)})"
        return grouped.agg(
            (
                F.sum(F.col(col).cast(dec)).cast("double")
                / F.count(col).cast("double")
            ).alias("__fill")
        )
    if strategy == "mode":
        counts = (
            df.where(F.col(col).isNotNull())
            .groupBy(*[F.col(g) for g in group_by], F.col(col).alias("__val"))
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        w = Window.partitionBy(*group_by).orderBy(
            F.desc("__c"), F.asc("__val")
        )
        return (
            counts.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") == 1)
            .select(*group_by, F.col("__val").alias("__fill"))
        )
    # median: the shared exact lower-median primitive
    # (profiling.grouped_lower_median — same histogram rank math)
    from pydi_spark.profiling import grouped_lower_median

    return grouped_lower_median(df, group_by, col, "__fill")


def impute_missing(
    df: DataFrame,
    strategies: dict[str, object],
    group_by: list[str] | None = None,
    scale: int = 2,
) -> DataFrame:
    """Fill nulls per column: ``strategies`` maps column ->
    ``"mean" | "median" | "mode"`` or ``("constant", value)``.
    ``group_by`` computes the statistic within each group (a group
    whose column is entirely null keeps its nulls — no cross-group
    leakage); without it the fill is one global value. A NULL group
    KEY is a group like any other (the join back is null-safe — a
    plain equi-join would strand every null-key row unfilled).

    Statistics are computed from the INPUT frame, so imputed columns
    never contaminate each other's fills regardless of dict order.
    """
    unknown = [
        (c, s)
        for c, s in strategies.items()
        if not (isinstance(s, tuple) and len(s) == 2 and s[0] == "constant")
        and s not in _STRATEGIES
    ]
    if unknown:
        raise ValueError(
            f"unknown strategies {unknown}; use {_STRATEGIES} or "
            "('constant', value)"
        )
    missing = [c for c in strategies if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    keys = list(group_by or [])
    out = df
    for col, strat in strategies.items():
        if isinstance(strat, tuple):
            out = out.withColumn(col, F.coalesce(F.col(col), F.lit(strat[1])))
            continue
        fill = _fill_frame(df, col, strat, keys, scale)
        fill = fill.withColumnRenamed("__fill", f"__fill_{col}")
        if keys:
            for g in keys:
                fill = fill.withColumnRenamed(g, f"__g_{g}")
            cond = None
            for g in keys:
                c = out[g].eqNullSafe(fill[f"__g_{g}"])
                cond = c if cond is None else cond & c
            out = out.join(fill, cond, "left").drop(
                *[f"__g_{g}" for g in keys]
            )
        else:
            out = out.crossJoin(F.broadcast(fill))
        out = out.withColumn(
            col, F.coalesce(F.col(col), F.col(f"__fill_{col}"))
        ).drop(f"__fill_{col}")
    return out
