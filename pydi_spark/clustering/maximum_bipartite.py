"""Maximum-weight bipartite matching.

Reference: MaximumBipartiteMatching (PyDI/entitymatching/post_clustering/
maximum_bipartite_matching.py:28-348) via NetworkX. Here: driver-side
``scipy.optimize.linear_sum_assignment`` on the collected edge set
(output-sized; SURVEY §4.3), gated import with a greedy fallback so the
operator works without scipy.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from pydi_spark.clustering.base import apply_threshold


@dataclass
class MaximumBipartiteMatcher:
    threshold: float | None = None

    def cluster(self, correspondences: DataFrame) -> DataFrame:
        corr = apply_threshold(correspondences, self.threshold)
        rows = corr.select("id1", "id2", "score").collect()
        if not rows:
            return corr.limit(0)
        left_ids = sorted({r["id1"] for r in rows})
        right_ids = sorted({r["id2"] for r in rows})
        li = {v: i for i, v in enumerate(left_ids)}
        ri = {v: i for i, v in enumerate(right_ids)}
        kept = self._solve(rows, li, ri, left_ids, right_ids)
        spark = corr.sparkSession
        kept_df = spark.createDataFrame(
            [(a, b) for a, b in kept], "id1 string, id2 string"
        )
        return corr.join(kept_df, ["id1", "id2"], "left_semi")

    @staticmethod
    def _solve(rows, li, ri, left_ids, right_ids):
        try:
            # the reference's own solver choice (NetworkX,
            # maximum_bipartite_matching.py:28-348)
            import networkx as nx

            g = nx.Graph()
            for r in rows:
                g.add_edge(("L", r["id1"]), ("R", r["id2"]), weight=float(r["score"]))
            matching = nx.algorithms.matching.max_weight_matching(g)
            out = []
            for a, b in matching:
                if a[0] == "R":
                    a, b = b, a
                out.append((a[1], b[1]))
            return sorted(out)
        except ImportError:
            try:
                import numpy as np
                from scipy.optimize import linear_sum_assignment

                cost = np.zeros((len(left_ids), len(right_ids)))
                for r in rows:
                    cost[li[r["id1"]], ri[r["id2"]]] = float(r["score"])
                rr, cc = linear_sum_assignment(-cost)
                return [
                    (left_ids[i], right_ids[j])
                    for i, j in zip(rr, cc)
                    if cost[i, j] > 0
                ]
            except ImportError:
                # greedy fallback: same contract, approximate weight
                used1, used2, kept = set(), set(), []
                for r in sorted(
                    rows, key=lambda r: (-float(r["score"]), r["id1"], r["id2"])
                ):
                    if r["id1"] in used1 or r["id2"] in used2:
                        continue
                    used1.add(r["id1"]); used2.add(r["id2"])
                    kept.append((r["id1"], r["id2"]))
                return kept
