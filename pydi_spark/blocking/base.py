"""Blocking base: candidate-pair generation as lazy joins.

Reference: BaseBlocker(df_left, df_right, id_column, batch_size)
(PyDI/entitymatching/blocking/base.py:29-84) — an *eager* index builder
exposing a generator of pair batches. Here a blocker is a factory of one
lazy DataFrame ``[id1, id2, block_key]``; Spark's partitions replace the
batch iterator (a DataFrame *is* a stream of batches), and the pair set
feeds straight into the matcher join without materialization.

Contract:
- ``block(left, right)`` -> DataFrame[id1: string, id2: string, block_key]
- pairs are unique on (id1, id2); id1 from left, id2 from right
- self-blocking (left is right) keeps only id1 < id2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pydi_spark.core.dataset import Dataset, as_dataframe

PAIR_COLUMNS = ["id1", "id2", "block_key"]


def resolve_side(
    data: Dataset | DataFrame, id_column: str | None
) -> tuple[DataFrame, str]:
    df = as_dataframe(data)
    idc = id_column or (data.id_column if isinstance(data, Dataset) else None)
    if idc is None:
        raise ValueError("id_column required (or pass a Dataset with one)")
    return df, idc


def dedup_pairs(pairs: DataFrame) -> DataFrame:
    """Cross-block duplicate suppression (reference: in-memory ``seen_pairs``
    set, token_blocking.py:293-306) -> shuffle-based dropDuplicates."""
    return pairs.dropDuplicates(["id1", "id2"])


def orient_self_pairs(pairs: DataFrame) -> DataFrame:
    """For self-joins keep one orientation and no self-pairs."""
    return pairs.where(F.col("id1") < F.col("id2"))


def block_stats(pairs: DataFrame) -> DataFrame:
    """Block-size distribution (reference logs it per blocker,
    blocking/standard.py:132-154): ``groupBy(block_key).count()``."""
    return pairs.groupBy("block_key").agg(F.count("*").alias("pair_count"))


def estimate_pairs(
    left: Dataset | DataFrame,
    right: Dataset | DataFrame,
    key_expr,
) -> int:
    """Pair-count estimate sum(|L_k| * |R_k|) without generating pairs
    (reference: standard.py:73-77). Count products run in
    decimal(38,0): two long counts multiplied in long overflow at
    ~3e9-row operands (the r6 int64-overflow rule — silent garbage
    under legacy arithmetic, a crash under ANSI)."""
    dl = as_dataframe(left).select(key_expr.alias("bk")).groupBy("bk").count()
    dr = as_dataframe(right).select(key_expr.alias("bk")).groupBy("bk").count()
    prod = F.col("l.count").cast("decimal(19,0)") * F.col(
        "r.count"
    ).cast("decimal(19,0)")
    row = (
        dl.alias("l")
        .join(dr.alias("r"), "bk")
        .agg(
            F.sum(prod).cast("decimal(38,0)").alias("n"),
            F.count(F.lit(1)).alias("n_blocks"),
        )
        .collect()[0]
    )
    # NULL sum over a non-empty join means decimal(38,0) overflow under
    # non-ANSI arithmetic — never report 0 pairs for it (ADVICE r7;
    # mirrors blocking_key_report's try_cast-NULL contract).
    if row["n"] is None and row["n_blocks"] > 0:
        raise OverflowError(
            "estimate_pairs: pair count exceeds decimal(38,0) — "
            "the key under test is unusable as a blocking key"
        )
    return int(row["n"] or 0)


def blocking_key_report(
    df: Dataset | DataFrame,
    candidate_keys: list[str],
    max_pairs_budget: int | None = None,
) -> DataFrame:
    """[key, n_rows, n_null, n_blocks, max_block, self_pairs,
    within_budget?] — the blocking-key PREFLIGHT: for each candidate
    key column, the self-join blocking cost/shape WITHOUT generating a
    single pair (the join_cardinality_report analogue for blockers;
    the reference only logs block sizes after the fact,
    PyDI blocking/standard.py:132-154).

    self_pairs = sum over blocks of n*(n-1)/2, computed in
    decimal(38,0) via n*(n-1) (always even) div 2 — the r6
    int64-overflow rule: never multiply two row-counts in long. It
    emerges as try_cast BIGINT: NULL means "more pairs than int64 can
    hold — do not run this key". NULL key values form no block (SQL
    group semantics would lump them; a null key is a missing key).

    Scale: one cardinality-bounded groupBy per candidate key; the
    report is |candidate_keys| rows. Use it before StandardBlocker to
    pick keys and size max_block_size.
    """
    frame = as_dataframe(df)
    if not candidate_keys:
        raise ValueError("candidate_keys must be non-empty")
    # all per-key null counts in ONE corpus pass
    null_row = frame.agg(
        *[
            F.count(F.when(F.col(k).isNull(), 1)).alias(k)
            for k in candidate_keys
        ]
    ).collect()[0]
    out = None
    for key in candidate_keys:
        counts = (
            frame.where(F.col(key).isNotNull())
            .groupBy(key)
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        row = counts.agg(
            F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias("n_rows"),
            F.count(F.lit(1)).alias("n_blocks"),
            F.coalesce(F.max("__n"), F.lit(0)).cast("long").alias("max_block"),
            F.expr(
                "try_cast(CAST(sum(CAST(__n AS DECIMAL(19,0)) "
                "* (CAST(__n AS DECIMAL(19,0)) - 1)) AS DECIMAL(38,0)) "
                "/ 2 AS BIGINT)"
            ).alias("self_pairs"),
        ).withColumn("key", F.lit(key))
        row = row.withColumn(
            "n_null", F.lit(int(null_row[key])).cast("long")
        )
        out = row if out is None else out.unionByName(row)
    cols = ["key", "n_rows", "n_null", "n_blocks", "max_block", "self_pairs"]
    out = out.select(*cols)
    if max_pairs_budget is not None:
        out = out.withColumn(
            "within_budget",
            (
                F.col("self_pairs").isNotNull()
                & (F.col("self_pairs") <= F.lit(int(max_pairs_budget)))
            ).cast("int"),
        )
    return out
