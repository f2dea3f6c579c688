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
    (reference: standard.py:73-77)."""
    dl = as_dataframe(left).select(key_expr.alias("bk")).groupBy("bk").count()
    dr = as_dataframe(right).select(key_expr.alias("bk")).groupBy("bk").count()
    row = (
        dl.alias("l")
        .join(dr.alias("r"), "bk")
        .agg(F.sum(F.col("l.count") * F.col("r.count")).alias("n"))
        .collect()[0]
    )
    return int(row["n"] or 0)
