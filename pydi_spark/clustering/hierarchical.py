"""Agglomerative (hierarchical) clustering over correspondences.

Reference: HierarchicalClusterer(linkage in {MIN, MAX, AVG}, num_clusters,
min_similarity) (PyDI/entitymatching/post_clustering/
hierarchical_clusterer.py:21-323). Sequential merging -> driver-side on
the collected (output-sized) edge set; scipy if present, else a pure-
Python naive agglomerative loop (fine at correspondence-set size).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class HierarchicalClusterer:
    linkage: str = "MIN"  # MIN | MAX | AVG  (single/complete/average)
    num_clusters: int | None = None
    min_similarity: float | None = None

    def assign(self, correspondences: DataFrame) -> DataFrame:
        rows = correspondences.select("id1", "id2", "score").collect()
        nodes = sorted({r["id1"] for r in rows} | {r["id2"] for r in rows})
        sims: dict[frozenset, float] = {}
        for r in rows:
            k = frozenset((r["id1"], r["id2"]))
            sims[k] = max(sims.get(k, 0.0), float(r["score"]))
        clusters: list[set] = [{n} for n in nodes]

        def cluster_sim(ca: set, cb: set) -> float | None:
            vals = [
                sims[frozenset((a, b))]
                for a in ca
                for b in cb
                if frozenset((a, b)) in sims
            ]
            if not vals:
                return None
            if self.linkage == "MIN":  # single linkage: max similarity
                return max(vals)
            if self.linkage == "MAX":  # complete linkage: min similarity
                return min(vals)
            return sum(vals) / len(vals)

        while len(clusters) > 1:
            if self.num_clusters and len(clusters) <= self.num_clusters:
                break
            best = None
            for i in range(len(clusters)):
                for j in range(i + 1, len(clusters)):
                    s = cluster_sim(clusters[i], clusters[j])
                    if s is None:
                        continue
                    if self.min_similarity is not None and s < self.min_similarity:
                        continue
                    key = (s, -i, -j)
                    if best is None or key > best[0]:
                        best = (key, i, j)
            if best is None:
                break
            _, i, j = best
            clusters[i] |= clusters[j]
            del clusters[j]

        pairs = []
        for c in clusters:
            cid = min(c)
            for n in sorted(c):
                pairs.append((n, cid))
        spark = correspondences.sparkSession
        return spark.createDataFrame(pairs, "record_id string, cluster_id string")

    def cluster(self, correspondences: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        comps = self.assign(correspondences)
        a = comps.select(F.col("record_id").alias("id1"), "cluster_id")
        b = comps.select(F.col("record_id").alias("id2"), "cluster_id")
        return (
            a.join(b, "cluster_id")
            .where(F.col("id1") < F.col("id2"))
            .select("id1", "id2", "cluster_id")
        )
