"""Constraint-based data repair: enforce a functional dependency by
majority vote.

Complements dependency discovery (profiling/dependencies.py): once a
profiler (or a domain expert) asserts ``A -> B`` *should* hold, the
violating groups need repairing — the Holistic-repair-style minimal fix
is to set every group's dependent to its most frequent value. The
reference's normalization tier stops at per-value transforms
(PyDI/normalization/transforms.py); this is the cross-row complement.

Scale shape: ONE groupBy on (det, dep) builds the vote table (map-side
combinable), a rank-1 window over the per-det votes picks the canonical
value (state per task = votes for one determinant's values, bounded by
that group's domain), and one equi-join on the determinant applies it.
The corpus shuffles once on the determinant key; a hot determinant
value is ordinary key skew (AQE).

Determinism: the winner is (count DESC, value ASC) — a total order, so
results are partition-independent and SQL-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def repair_fd_violations(
    df: DataFrame,
    determinant: str,
    dependent: str,
) -> DataFrame:
    """Return ``df`` with ``dependent`` replaced by the majority value
    within each ``determinant`` group (ties break to the smallest value
    in the column's native ordering).

    Null handling: rows with a null determinant are untouched (no group
    to vote in); null dependent values don't vote, and a group whose
    votes are all null keeps its nulls. The repaired frame adds
    ``__repaired`` (int 0/1) marking rows whose value changed.
    """
    votes = (
        df.where(F.col(determinant).isNotNull()
                 & F.col(dependent).isNotNull())
        .groupBy(determinant, dependent)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w = Window.partitionBy(determinant).orderBy(
        F.desc("__n"), F.asc(dependent)
    )
    canon = (
        votes.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select(determinant, F.col(dependent).alias("__canon"))
    )
    joined = df.join(canon, determinant, "left")
    fixed = F.when(
        F.col(determinant).isNotNull() & F.col("__canon").isNotNull(),
        F.col("__canon"),
    ).otherwise(F.col(dependent))
    changed = (
        ~fixed.eqNullSafe(F.col(dependent))
    ).cast("int")
    out_cols = [
        fixed.alias(c) if c == dependent else F.col(c) for c in df.columns
    ]
    return joined.select(*out_cols, changed.alias("__repaired"))


def fd_repair_report(
    df: DataFrame, determinant: str, dependent: str
) -> DataFrame:
    """One-row summary of what :func:`repair_fd_violations` would do:
    ``[n_groups, n_violating_groups, n_rows_changed]`` (exact ints)."""
    repaired = repair_fd_violations(df, determinant, dependent)
    per_group = (
        df.where(F.col(determinant).isNotNull()
                 & F.col(dependent).isNotNull())
        .groupBy(determinant)
        .agg(F.count_distinct(dependent).alias("__vals"))
    )
    groups = per_group.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("__vals") > 1).cast("long")).alias("n_violating_groups"),
    )
    changed = repaired.agg(
        F.sum("__repaired").cast("long").alias("n_rows_changed")
    )
    return groups.crossJoin(changed)
