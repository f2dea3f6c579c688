"""Snapshot diff: keyed added / removed / changed between two tables.

Pipelines that re-run ingestion need to answer "what changed since the
last snapshot" — to publish incremental feeds, audit fusion reruns, or
gate a deploy on an unexpectedly large delta. ``table_diff`` is that
operator: a keyed FULL OUTER join comparing a deterministic row digest
of the compared columns.

Scale shape: ONE shuffle on the key (the full-outer join); the digest
is computed map-side per input row, so the compare itself is
whole-stage-codegen scalar work. Typical snapshots co-partition (same
key, same layout), so at scale the exchange is often elided by
bucketing (io/bucketing.py).

Digest portability: md5 over the compared columns cast to strings with
an explicit NULL sentinel and a 0x1f separator — NOT ``to_json``
(engine-specific key ordering/float formatting). Keep compared columns
int/string/date typed when the digest must be replayed cross-engine
(the oracle pattern); double formatting differs between engines.

No reference counterpart (PyDI has no snapshot diff) — north-star op.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"
_NULL = "\x00null"


def row_digest(cols: list[str]) -> Column:
    """md5 digest of the named columns (null-safe, order-pinned)."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts).cast("binary"))


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str] | str,
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff two snapshots keyed by ``key_cols``.

    Output: the key columns plus ``diff_status`` in
    {'added','removed','changed'} (plus 'unchanged' when
    ``include_unchanged``). ``compare_cols`` defaults to every shared
    non-key column. Duplicate keys within a snapshot are a feed bug;
    results remain deterministic (digest compares whatever rows share
    the key, status 'changed' when any digest differs).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    if not compare_cols:
        raise ValueError("no columns to compare")
    o = old.select(*keys, row_digest(compare_cols).alias("__h_old"))
    n = new.select(*keys, row_digest(compare_cols).alias("__h_new"))
    j = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(*keys, status.alias("diff_status"))
    if not include_unchanged:
        out = out.where(F.col("diff_status") != "unchanged")
    return out


def diff_summary(diff: DataFrame) -> DataFrame:
    """Counts per diff_status: ``[diff_status, n]`` — the delta-gate
    aggregate (alert when |changed|+|removed| exceeds a budget)."""
    return diff.groupBy("diff_status").agg(
        F.count(F.lit(1)).alias("n")
    )
