"""Change-data-capture application: MERGE-style upserts on plain
parquet tables (no transactional table format required).

A data-integration pipeline that maintains a master entity table needs
to apply change batches — inserts, updates, deletes — deterministically.
``apply_changes`` is the engine's last-writer-wins merge: pure
DataFrame ops, SQL-replayable, no Delta/Iceberg dependency (swap in
``MERGE INTO`` where one exists; the semantics below match).

Scale shape: ONE shuffle by key over (base ∪ changes); the rank window
partitions by key, so state per task is the per-key version chain
(bounded by change volume per key, not table size). Base rows carry
version -1 so any change outranks them; ties inside a change batch
break by operation precedence then deterministic order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_col: str,
    version_col: str = "version",
    op_col: str = "op",
) -> DataFrame:
    """Apply a change batch to a base table, last-writer-wins.

    ``changes`` carries the base's data columns plus ``version_col``
    (monotone change ordering — a sequence number or event time cast to
    a comparable integer) and ``op_col`` with values 'I'/'U' (upsert)
    or 'D' (delete). Result: one row per surviving key — the
    highest-version change wins; a winning 'D' removes the key; keys
    untouched by changes keep their base row. Version ties are a feed
    bug (pin versions unique per key), but when they happen the winner
    is still deterministic: op asc, then the md5 of the row's data
    columns — never the shuffle arrival order, so the result is
    partition-independent even on malformed input.
    """
    data_cols = [c for c in base.columns]
    b = base.select(
        *data_cols,
        F.lit(-1).cast("long").alias("__v"),
        F.lit("B").alias("__op"),
    )
    c = changes.select(
        *data_cols,
        F.col(version_col).cast("long").alias("__v"),
        F.col(op_col).alias("__op"),
    )
    unioned = b.unionByName(c)
    row_hash = F.md5(F.to_json(F.struct(*[F.col(x) for x in data_cols])))
    w = Window.partitionBy(key_col).orderBy(
        F.desc("__v"), F.asc("__op"), row_hash.asc()
    )
    ranked = unioned.withColumn("__rk", F.row_number().over(w))
    return (
        ranked.where((F.col("__rk") == 1) & (F.col("__op") != "D"))
        .select(*data_cols)
    )


def scd2_history(
    changes: DataFrame,
    key_col: str,
    version_col: str = "version",
    op_col: str = "op",
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a change
    stream: one validity interval per non-delete change.

    ``changes`` carries the data columns plus ``version_col`` (monotone
    ordering) and ``op_col`` ('I'/'U' upsert, 'D' delete). Output: the
    data columns plus ``valid_from`` (the change's version),
    ``valid_to`` (the NEXT change's version for the key — null while
    open), and ``is_current`` (int 1 when the interval is open, i.e.
    the key's latest change and not superseded; a trailing 'D' closes
    the last interval, so deleted keys have no current row).

    Scale shape: ONE shuffle on the key; the lead window's state per
    task is a key's change chain (bounded by change volume per key).
    Version ties are a feed bug but stay deterministic — same total
    order as :func:`apply_changes` (version, op, row md5).
    """
    data_cols = [
        c for c in changes.columns if c not in (version_col, op_col)
    ]
    row_hash = F.md5(F.to_json(F.struct(*[F.col(x) for x in data_cols])))
    w = Window.partitionBy(key_col).orderBy(
        F.asc(version_col), F.asc(op_col), row_hash.asc()
    )
    with_next = changes.withColumn(
        "valid_to", F.lead(F.col(version_col).cast("long")).over(w)
    )
    return with_next.where(F.col(op_col) != "D").select(
        *data_cols,
        F.col(version_col).cast("long").alias("valid_from"),
        "valid_to",
        (F.col("valid_to").isNull()).cast("int").alias("is_current"),
    )

def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    key_col: str,
    at_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    how: str = "left",
    suffix: str = "_dim",
) -> DataFrame:
    """Join each fact row to the dimension version valid AT the fact's
    time: ``history.key = facts.key AND valid_from <= at <
    coalesce(valid_to, infinity)`` — the consumption twin of
    :func:`scd2_history` (the warehouse "point-in-time correct" join a
    plain equi-join to ``is_current`` silently gets wrong for
    historical facts). SCD2 intervals partition each key's timeline, so
    every fact matches AT MOST one version; unmatched facts keep null
    dimension columns under the default left join.

    Scale shape: ONE equi-join shuffle on the key with the interval
    predicate riding in the join condition (Catalyst keeps it a hash
    join keyed on ``key_col``; the interval check is a post-probe
    filter per key group, bounded by versions-per-key). History
    columns colliding with fact columns get ``suffix``.
    """
    if how not in ("left", "inner"):
        raise ValueError(
            "point_in_time_join supports how='left'|'inner' — other "
            "join types either drop the history key (full/right: "
            "unmatched history rows would surface keyless) or cannot "
            f"carry history columns (semi/anti): {how!r}"
        )
    f, h = facts.alias("__f"), history.alias("__h")
    cond = (
        (F.col(f"__f.{key_col}") == F.col(f"__h.{key_col}"))
        & (F.col(f"__f.{at_col}") >= F.col(f"__h.{valid_from_col}"))
        & (
            F.col(f"__h.{valid_to_col}").isNull()
            | (F.col(f"__f.{at_col}") < F.col(f"__h.{valid_to_col}"))
        )
    )
    emitted = list(facts.columns)
    out_cols = [F.col(f"__f.{c}") for c in facts.columns]
    for c in history.columns:
        if c == key_col:
            continue
        name = c + suffix if c in emitted else c
        if name in emitted:
            raise ValueError(
                f"column name collision even after suffixing: {name!r} "
                f"(suffix={suffix!r}) — rename inputs or pass a suffix"
            )
        emitted.append(name)
        out_cols.append(F.col(f"__h.{c}").alias(name))
    return f.join(h, cond, how).select(*out_cols)
