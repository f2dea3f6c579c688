"""Sketch-based profiling: mergeable summaries for 100 TB-scale stats.

Exact distinct counts and quantiles need full shuffles; sketches give
bounded-error answers in one pass AND are mergeable — per-partition /
per-day sketches union into corpus totals without touching raw data
again (the only viable shape for incremental profiling at 100 TB).

Built on Spark 4's native Apache DataSketches functions (hll_*, kll_*):
JVM-side, codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_distinct(df: DataFrame, columns: list[str] | None = None,
                 lg_k: int = 12) -> DataFrame:
    """[column_name, approx_distinct, sketch]: HLL estimate + the binary
    sketch itself (keep the sketch; tomorrow's increment unions into it
    via ``merge_hll_sketches`` with no rescan of today's data)."""
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs.append(F.hll_sketch_agg(F.col(c).cast("string"), lg_k).alias(f"__sk_{c}"))
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    out = [
        (c, row[f"__sk_{c}"]) for c in cols
    ]
    sk_df = spark.createDataFrame(out, "column_name string, sketch binary")
    return sk_df.select(
        "column_name",
        F.hll_sketch_estimate("sketch").alias("approx_distinct"),
        "sketch",
    )


def merge_hll_sketches(*sketch_frames: DataFrame) -> DataFrame:
    """Union per-batch sketch tables -> combined estimates per column."""
    merged = sketch_frames[0]
    for other in sketch_frames[1:]:
        merged = merged.unionByName(other)
    return (
        merged.groupBy("column_name")
        .agg(F.hll_union_agg("sketch").alias("sketch"))
        .select(
            "column_name",
            F.hll_sketch_estimate("sketch").alias("approx_distinct"),
            "sketch",
        )
    )


def kll_quantiles(
    df: DataFrame,
    column: str,
    quantiles: list[float] = (0.25, 0.5, 0.75, 0.95),
    k: int = 200,
) -> DataFrame:
    """[quantile, value] via a KLL sketch — one pass, mergeable, bounded
    rank error (vs percentile_approx's Greenwald-Khanna, not mergeable
    across frames)."""
    sk = df.agg(
        F.kll_sketch_agg_double(F.col(column).cast("double"), F.lit(k)).alias("sk")
    )
    rows = []
    for q in quantiles:
        rows.append(
            sk.select(
                F.lit(float(q)).alias("quantile"),
                F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(float(q))).alias("value"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
