"""Deterministic hash-based sampling for training-data pipelines.

``df.sample()`` is partition- and seed-layout dependent: re-running on a
repartitioned input selects DIFFERENT rows, which breaks reproducible
corpus builds and incremental re-runs. Hash sampling keys the decision
to the ROW: ``md5(key) -> [0, 1)`` fraction compared to the rate, so the
same row is always in or always out, regardless of partitioning, engine,
cluster size, or which increment it arrives in. md5 (not xxhash) keeps
the decision portable across engines — the same property the MinHash /
SimHash paths rely on (NOTES.md invariant 2).

Stratified rates let a pipeline up/down-weight sources ("domain
mixing"): pass ``rates={stratum: rate}`` + a default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = float(1 << 32)


def hash_fraction(key: Column) -> Column:
    """Uniform [0, 1) fraction from the first 8 md5 hex chars of key."""
    h = F.substring(F.md5(key.cast("string")), 1, 8)
    return F.conv(h, 16, 10).cast("bigint") / F.lit(_HASH_SPACE)


def deterministic_sample(
    df: DataFrame,
    rate: float,
    key_col: str,
    stratum_col: str | None = None,
    rates: dict[str, float] | None = None,
) -> DataFrame:
    """Keep each row iff hash_fraction(key) < its rate. ``rates`` maps
    ``stratum_col`` values to per-stratum rates (missing strata fall
    back to ``rate``)."""
    frac = hash_fraction(F.col(key_col))
    if rates:
        if not stratum_col:
            raise ValueError("rates requires stratum_col")
        r: Column = F.lit(float(rate))
        for value, value_rate in sorted(rates.items()):
            r = F.when(
                F.col(stratum_col) == F.lit(value), F.lit(float(value_rate))
            ).otherwise(r)
        return df.where(frac < r)
    return df.where(frac < F.lit(float(rate)))
