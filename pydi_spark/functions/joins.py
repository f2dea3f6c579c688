"""Join utilities for skewed keys.

``salted_join`` is the classic remedy when ONE join key dominates and
the build side can't broadcast: the probe (big) side appends a random
salt in [0, n), the build side replicates each row n times — the hot
key's rows spread across n tasks instead of one. AQE's skew-join
splitting covers most cases automatically; use this when the skew is in
a non-equi pattern AQE can't split, or AQE is unavailable.

The salt is deterministic per row (hash of the whole row modulo n), so
results are reproducible and retries are safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salt-spread hot keys.

    ``small`` is replicated ``num_salts`` times — keep it the smaller
    side. Output columns match a plain ``big.join(small, on, how)``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    salt_src = [F.col(c) for c in big.columns]
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_src), F.lit(num_salts)).cast("int")
    )
    small_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    out = big_salted.join(small_salted, keys + ["__salt"], how)
    return out.drop("__salt")
