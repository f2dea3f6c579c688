"""Sorted-neighbourhood blocking = global rank + offset equi-join.

Reference: SortedNeighbourhoodBlocker (PyDI/entitymatching/blocking/
sorted_neighbourhood.py:17-131): union both sides with a side tag, stable
sort on the lowercased key, slide a window of size w, keep cross-side
pairs oriented L->R.

Spark-first shape, chosen for scale:
1. **Global rank without a single-partition window**: ``Window.orderBy``
   with no partition key collapses to one partition. Instead we
   range-repartition on the sort key, rank *within* partitions (parallel),
   then add broadcast cumulative partition offsets — two narrow passes,
   fully distributed (see ``global_row_number``).
2. **Window pairing as an equi-join, not a range join**: explode each row
   into offsets 1..w and hash-join on ``rank2 = rank1 + offset``. A
   ``BETWEEN`` range join would execute as a nested-loop; the explode
   form is linear in n*w and shuffle-partitioned.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pydi_spark.blocking.base import resolve_side
from pydi_spark.core.dataset import Dataset
from pydi_spark.functions.ranks import global_row_number

# global_row_number moved to functions.ranks (shared with
# deterministic ID injection); re-exported here for compatibility.


@dataclass
class SortedNeighbourhoodBlocker:
    key: str
    window: int = 3
    cross_side_only: bool = True

    def block(
        self,
        left: Dataset | DataFrame,
        right: Dataset | DataFrame | None = None,
        id_column: str | None = None,
    ) -> DataFrame:
        self_join = right is None or right is left
        dl, idl = resolve_side(left, id_column)
        dr, idr = resolve_side(left if self_join else right, id_column)

        l = dl.select(
            F.col(idl).cast("string").alias("rec_id"),
            F.lower(F.col(self.key).cast("string")).alias("sort_key"),
            F.lit("L").alias("side"),
        )
        r = dr.select(
            F.col(idr).cast("string").alias("rec_id"),
            F.lower(F.col(self.key).cast("string")).alias("sort_key"),
            F.lit("R").alias("side"),
        )
        if self_join:
            both = l.withColumn("side", F.lit("S"))
        else:
            both = l.unionByName(r)
        # deterministic total order: key, then side+id tiebreak (the
        # reference uses a stable mergesort for the same reason,
        # sorted_neighbourhood.py:70-71)
        ranked = global_row_number(both, ["sort_key", "side", "rec_id"])

        w = int(self.window)
        a = ranked.select(
            F.col("rec_id").alias("rid_a"), F.col("side").alias("side_a"),
            F.col("rn").alias("rn_a"),
            F.explode(F.sequence(F.lit(1), F.lit(w))).alias("off"),
        ).withColumn("rn_b", F.col("rn_a") + F.col("off"))
        b = ranked.select(
            F.col("rec_id").alias("rid_b"), F.col("side").alias("side_b"),
            F.col("rn").alias("rn_b"),
        )
        joined = a.join(b, "rn_b")
        if self_join:
            pairs = joined.select(
                F.least("rid_a", "rid_b").alias("id1"),
                F.greatest("rid_a", "rid_b").alias("id2"),
            ).where(F.col("id1") != F.col("id2"))
        else:
            if self.cross_side_only:
                joined = joined.where(F.col("side_a") != F.col("side_b"))
            pairs = joined.select(
                F.when(F.col("side_a") == "L", F.col("rid_a")).otherwise(F.col("rid_b")).alias("id1"),
                F.when(F.col("side_a") == "L", F.col("rid_b")).otherwise(F.col("rid_a")).alias("id2"),
            )
        return (
            pairs.withColumn("block_key", F.lit("snb"))
            .dropDuplicates(["id1", "id2"])
        )
