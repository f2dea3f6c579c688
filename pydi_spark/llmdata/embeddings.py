"""Embedding-column utilities for training-data pipelines.

Beyond-reference (north-star) ops over ``array<float>`` columns:
L2 normalization, symmetric int8 quantization (the standard storage
shrink before ANN indexing), and per-group mean pooling.

Float determinism: everything is computed in float64 with explicit
left-fold order (``F.aggregate`` with a 0.0 seed) so a DuckDB
``list_reduce`` oracle reproduces the bits; pooling sums each dimension
in sorted order (the fusion ``_sorted_sum`` rule). Quantization rounds
via ``floor(x + 0.5)`` — identical half-up behavior on both engines,
where native ``round`` HALF_UP (Spark) vs scaled-rint (DuckDB) could
diverge on exact halves.

All per-row work is a native higher-order expression over a ~10²-dim
array (the documented OK case for HOFs); group pooling shuffles
(group, dim) pairs, never whole matrices.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _l2_norm(vec_d: Column) -> Column:
    return F.sqrt(
        F.aggregate(vec_d, F.lit(0.0), lambda a, x: a + x * x)
    )


def l2_normalize(
    df: DataFrame, vector_col: str = "embedding", out_col: str = "normalized"
) -> DataFrame:
    """Unit-norm vectors (zero vectors pass through unchanged)."""
    v = _as_double(F.col(vector_col))
    n = _l2_norm(v)
    return df.withColumn(
        out_col,
        F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v),
    ).withColumn("l2_norm", n)


def quantize_int8(
    df: DataFrame, vector_col: str = "embedding", normalize: bool = True
) -> DataFrame:
    """Adds ``qvec`` (array<int>, in [-127, 127]) and ``scale`` (the
    multiplier that was applied before rounding): symmetric per-vector
    int8 quantization, optionally on the L2-normalized vector."""
    v = _as_double(F.col(vector_col))
    if normalize:
        n = _l2_norm(v)
        v = F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v)
    max_abs = F.aggregate(
        v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))
    )
    scale = F.when(max_abs > 0, 127.0 / max_abs).otherwise(F.lit(0.0))
    qvec = F.transform(v, lambda x: F.floor(x * scale + 0.5).cast("int"))
    return df.withColumn("scale", scale).withColumn("qvec", qvec)


def mean_pool(
    df: DataFrame,
    group_col: str,
    vector_col: str = "embedding",
) -> DataFrame:
    """[group, pooled array<double>, n_vectors]: per-group mean vector.

    Shuffles (group, dim, value) triples — never materializes a group's
    matrix anywhere — and sums each dimension in sorted value order so
    the result is independent of partitioning (and reproducible by a
    sorted-list oracle)."""
    exploded = df.select(
        F.col(group_col).alias("group"),
        F.posexplode(_as_double(F.col(vector_col))).alias("dim", "x"),
    )
    per_dim = exploded.groupBy("group", "dim").agg(
        F.aggregate(
            F.array_sort(F.collect_list("x")), F.lit(0.0), lambda a, x: a + x
        ).alias("s"),
        F.count("*").alias("n"),
    )
    return (
        per_dim.withColumn("m", F.col("s") / F.col("n"))
        .groupBy("group")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))),
                lambda t: t["m"],
            ).alias("pooled"),
            F.max("n").alias("n_vectors"),
        )
    )
