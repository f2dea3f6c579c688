"""Active-learning support for entity matching.

The loop a labeling workflow runs: score candidates, pull the pairs the
model is LEAST sure about, label them, retrain. The reference stops at
threshold matching; the uncertainty sampler is the missing query
surface (standard uncertainty sampling, e.g. Settles 2009).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def uncertainty_band(
    scored_pairs: DataFrame,
    threshold: float,
    band: float = 0.1,
    max_pairs: int | None = None,
    score_col: str = "score",
) -> DataFrame:
    """Pairs whose score lies within ``±band`` of the decision
    threshold — the next labeling batch for an active-learning loop.
    Output: [id1, id2, score, margin(, rank)] with ``margin =
    |score − threshold|``; with ``max_pairs`` the most-uncertain pairs
    are kept via sort+limit (per-partition heaps — never a global
    window over the candidate set) and ranked.

    Determinism: margin is one subtraction + abs of an already
    engine-portable score; ties break on (id1, id2)."""
    t = float(threshold)
    out = scored_pairs.withColumn(
        "margin", F.abs(F.col(score_col) - F.lit(t))
    ).where(F.col("margin") <= F.lit(float(band)))
    if max_pairs is None:
        return out
    top = out.orderBy(
        F.asc("margin"), F.asc("id1"), F.asc("id2")
    ).limit(int(max_pairs))
    w = Window.orderBy(F.asc("margin"), F.asc("id1"), F.asc("id2"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))
