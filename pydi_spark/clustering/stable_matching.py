"""Stable (mutual-best) matching — fully distributed.

Reference: StableMatching (PyDI/entitymatching/post_clustering/
stable_matching.py:19-348): keep a pair when each side is the other's
best-scoring candidate. Spark shape (SURVEY §2.5): two
``row_number().over(Window.partitionBy(side).orderBy(desc(score)))``
rank-1 projections inner-joined on equality — two shuffles, no driver
state. Deterministic tie-break on partner id.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pydi_spark.clustering.base import apply_threshold


@dataclass
class StableMatcher:
    threshold: float | None = None
    force_one_to_one: bool = True

    def cluster(self, correspondences: DataFrame) -> DataFrame:
        corr = apply_threshold(correspondences, self.threshold)
        w1 = Window.partitionBy("id1").orderBy(F.desc("score"), F.col("id2"))
        w2 = Window.partitionBy("id2").orderBy(F.desc("score"), F.col("id1"))
        best1 = corr.withColumn("__r", F.row_number().over(w1)).where("__r = 1").drop("__r")
        best2 = corr.withColumn("__r", F.row_number().over(w2)).where("__r = 1").drop("__r")
        mutual = best1.select("id1", "id2").join(best2.select("id1", "id2"), ["id1", "id2"])
        out = corr.join(mutual, ["id1", "id2"], "left_semi")
        return out
