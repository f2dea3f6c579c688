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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of join: each left row picks the nearest right row at-or-before
    (``backward``) / at-or-after (``forward``) its ``on`` value, per
    ``by`` group. Left rows with no eligible right row keep nulls
    (pandas ``merge_asof`` semantics).

    Scale design: NOT a range join (quadratic) — both sides are tagged
    and unioned, then a single window pass carries the last-seen right
    values forward: one shuffle on ``by``, linear scan, no join at all.
    This survives 100 TB where per-key binary-search joins don't
    distribute. A single ``by`` group is one window partition, so a
    pathologically hot key serializes — pre-split such keys by time
    range if needed.

    Determinism: among right rows with equal (``by``, ``on``) the one
    with the greatest remaining-column tuple wins (an explicit
    tiebreak ordering on all carried columns); dedupe the right side
    first when that matters.

    ``tolerance``: a Column/literal in the same units as ``on`` (e.g.
    ``F.expr("INTERVAL 1 HOUR")`` for timestamps); matches farther than
    the tolerance are nulled, the left row survives.
    """
    from pyspark.sql import Window

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    by_cols = [by] if isinstance(by, str) else list(by or [])
    carry = [c for c in right.columns if c not in by_cols and c != on]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in carry + [on]
    }

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in carry],
        F.lit(None).cast(right.schema[on].dataType).alias("__r_on"),
    )
    rhs = right.select(
        *[
            # by-keys and the time column keep the RIGHT row's values —
            # the window shuffles on `by` and orders on `on` for both
            # sides; everything else is null padding
            F.col(c).cast(left.schema[c].dataType).alias(c)
            if (c in by_cols or c == on)
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in carry],
        F.col(on).alias("__r_on"),
    )
    unioned = lhs.unionByName(rhs)

    order = [
        F.col(on).asc() if direction == "backward" else F.col(on).desc(),
        F.col("__side").asc(),
        # deterministic tie-break among equal-(by, on) right rows: the
        # greatest carried tuple is the last seen
        *[F.col(f"__r_{c}").asc_nulls_first() for c in carry],
    ]
    w = (
        Window.partitionBy(*[F.col(c) for c in by_cols])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("__side"),
        F.last("__r_on", ignorenulls=True).over(w).alias("__m_on"),
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
          for c in carry],
    ).where(F.col("__side") == 1)

    within = F.lit(True)
    if tolerance is not None:
        from pyspark.sql import Column

        tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
        gap = (
            F.col(on) - F.col("__m_on")
            if direction == "backward"
            else F.col("__m_on") - F.col(on)
        )
        within = F.col("__m_on").isNotNull() & (gap <= tol)

    return matched.select(
        *[F.col(c) for c in left.columns],
        F.when(within, F.col("__m_on")).alias(out_names[on]),
        *[F.when(within, F.col(f"__m_{c}")).alias(out_names[c]) for c in carry],
    )
