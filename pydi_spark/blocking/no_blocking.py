"""Full cartesian candidate generation.

Reference: NoBlocker (PyDI/entitymatching/blocking/noblocking.py:15-53)
streams the |L|x|R| product in chunks via numpy repeat/tile. Spark's
``crossJoin`` is the same logical op executed as a partitioned
nested-loop — each task produces one (left-partition x right-partition)
chunk, so memory stays bounded without any chunking code.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pydi_spark.blocking.base import orient_self_pairs, resolve_side
from pydi_spark.core.dataset import Dataset


@dataclass
class NoBlocker:
    def block(
        self,
        left: Dataset | DataFrame,
        right: Dataset | DataFrame | None = None,
        id_column: str | None = None,
    ) -> DataFrame:
        self_join = right is None or right is left
        dl, idl = resolve_side(left, id_column)
        dr, idr = resolve_side(left if self_join else right, id_column)
        l = dl.select(F.col(idl).cast("string").alias("id1"))
        r = dr.select(F.col(idr).cast("string").alias("id2"))
        pairs = l.crossJoin(r).withColumn("block_key", F.lit("*"))
        if self_join:
            pairs = orient_self_pairs(pairs)
        return pairs
