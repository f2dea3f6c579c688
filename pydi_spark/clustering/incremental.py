"""Incremental clustering: fold new records into an existing clustering.

Beyond the reference (which re-clusters from scratch): production entity
resolution matches a daily increment against a large, already-clustered
corpus. Re-running connected components over the full history is O(all
data); incremental assignment is O(increment):

1. block + match new records against the existing corpus (caller does
   this with any blocker/matcher — candidates stay O(increment));
2. each new record adopts the cluster of its best accepted match
   (deterministic tie-breaks), else becomes a singleton cluster;
3. matches BETWEEN new records merge transitively first (CC over the
   increment only — small).

The result is exactly a union-find step against frozen history: existing
cluster ids never change (stable ids are the operational contract;
full re-clustering periodically reconciles drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pydi_spark.clustering.connected_components import connected_components


def assign_new_records(
    existing_assignments: DataFrame,
    new_ids: DataFrame,
    new_to_existing: DataFrame,
    new_to_new: DataFrame | None = None,
    threshold: float = 0.0,
) -> DataFrame:
    """-> [record_id, cluster_id] for the NEW records only.

    - existing_assignments: [record_id, cluster_id] (frozen history)
    - new_ids: [record_id] of the increment
    - new_to_existing: correspondences [id1=new, id2=existing, score]
    - new_to_new: optional correspondences within the increment
    """
    corr = new_to_existing.where(F.col("score") >= F.lit(float(threshold)))
    # best existing match per new record -> its cluster
    w = Window.partitionBy("id1").orderBy(F.desc("score"), F.col("id2"))
    best = (
        corr.withColumn("__r", F.row_number().over(w))
        .where("__r = 1")
        .select(F.col("id1").alias("record_id"), F.col("id2").alias("match_id"))
    )
    adopted = best.join(
        existing_assignments.withColumnRenamed("record_id", "match_id"),
        "match_id",
    ).select("record_id", "cluster_id")

    base = new_ids.select(F.col("record_id").cast("string").alias("record_id"))
    if new_to_new is not None:
        nn = new_to_new.where(F.col("score") >= F.lit(float(threshold)))
        groups = connected_components(nn.select("id1", "id2"))
        base = base.join(groups, "record_id", "left").withColumnRenamed(
            "cluster_id", "new_group"
        )
    else:
        base = base.withColumn("new_group", F.lit(None).cast("string"))

    # resolve: adopted cluster wins; within a new-group, the minimum
    # adopted cluster id (if any member adopted one) propagates; else the
    # group id (min new record id) becomes a fresh cluster id
    joined = base.join(adopted, "record_id", "left")
    group_cluster = (
        joined.where(F.col("new_group").isNotNull())
        .groupBy("new_group")
        .agg(F.min("cluster_id").alias("group_cluster"))
    )
    out = (
        joined.join(group_cluster, "new_group", "left")
        .select(
            "record_id",
            F.coalesce(
                F.col("cluster_id"),
                F.col("group_cluster"),
                F.col("new_group"),
                F.col("record_id"),
            ).alias("cluster_id"),
        )
    )
    return out
