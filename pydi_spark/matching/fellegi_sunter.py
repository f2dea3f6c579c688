"""Fellegi–Sunter probabilistic record linkage (log-likelihood scoring).

Classic probabilistic linkage (Fellegi & Sunter 1969; the model behind
Splink and the US Census matcher). The reference engine stops at
rule-based / ML matchers (PyDI/entitymatching/rule_based.py:16-517);
this module adds the probabilistic tier on the same pair tables:

- each feature is a binary *agreement* gamma derived from an existing
  comparator expression (``comparator.expr(...) >= agree_threshold``),
  so gamma computation is pure whole-stage-codegen Column work;
- the match score is ``sum_i (gamma_i ? w_agree_i : w_disagree_i)``
  where ``w_* = log2(m/u)`` / ``log2((1-m)/(1-u))`` are supplied as
  **integer micro-weights** — the per-pair score is an exact integer
  aggregate, identical across engines (the oracle replays it verbatim;
  no libm log in the distributed path);
- m/u estimation runs EM **driver-side over the distinct
  agreement-pattern histogram** (<= 2^k rows regardless of corpus
  size) — the only collect is that tiny histogram, so training is
  scale-independent like the k-means codebook trainers.

Scale shape: gammas + score are one projection over the joined pair
table (`join_pairs_to_records` repartitions the ids-only pair table
first — NOTES.md scoring-width lesson); the EM histogram is one
map-side-combinable groupBy on <= 2^k keys.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pydi_spark.core.dataset import Dataset
from pydi_spark.functions.comparators import BaseComparator
from pydi_spark.matching.rule_based import join_pairs_to_records

MICRO = 1_000_000


@dataclass
class FSWeights:
    """m/u probabilities and the derived integer micro log2-weights."""

    m: list[float]
    u: list[float]
    lam: float
    agree_micro: list[int] = field(default_factory=list)
    disagree_micro: list[int] = field(default_factory=list)

    def __post_init__(self) -> None:
        if not self.agree_micro:
            self.agree_micro = [
                int(round(math.log2(m / u) * MICRO))
                for m, u in zip(self.m, self.u)
            ]
        if not self.disagree_micro:
            self.disagree_micro = [
                int(round(math.log2((1.0 - m) / (1.0 - u)) * MICRO))
                for m, u in zip(self.m, self.u)
            ]


def fs_weights_from_mu(m: list[float], u: list[float], lam: float = 0.5) -> FSWeights:
    """Micro log2 Bayes-factor weights from m/u probability lists."""
    if len(m) != len(u):
        raise ValueError("m and u must have the same length")
    for p in list(m) + list(u):
        if not 0.0 < p < 1.0:
            raise ValueError(f"probabilities must be in (0,1), got {p}")
    return FSWeights(m=list(m), u=list(u), lam=lam)


@dataclass
class FellegiSunterMatcher:
    """Score blocked pairs with Fellegi–Sunter log-likelihood weights.

    ``features``: list of ``(comparator, agree_threshold)`` — gamma_i is
    1 when the comparator similarity is >= the threshold (nulls
    disagree, matching the reference's null-scores-zero rule,
    rule_based.py:302-339). ``weights``: an :class:`FSWeights` (inject
    known weights for a deterministic pipeline, or fit with
    :func:`train_fs_em`). Output: ``[id1, id2, gamma_<col>...,
    score_micro]``; ``threshold_micro`` (optional) keeps pairs with
    ``score_micro >= threshold_micro``.
    """

    features: list[tuple[BaseComparator, float]]
    weights: FSWeights
    threshold_micro: int | None = None

    def gamma_columns(self) -> list[str]:
        names = []
        for cmp_, _ in self.features:
            base = f"gamma_{cmp_.column}"
            name, k = base, 2
            while name in names:
                name, k = f"{base}_{k}", k + 1
            names.append(name)
        return names

    def match(
        self,
        left: Dataset | DataFrame,
        right: Dataset | DataFrame,
        pairs: DataFrame,
        id_column: str | None = None,
    ) -> DataFrame:
        n = len(self.features)
        if len(self.weights.m) != n:
            raise ValueError(
                f"weights cover {len(self.weights.m)} features, got {n}"
            )
        joined = join_pairs_to_records(pairs, left, right, id_column)
        names = self.gamma_columns()
        cols = [F.col("p.id1").alias("id1"), F.col("p.id2").alias("id2")]
        score = F.lit(0).cast("long")
        for (cmp_, thresh), name, aw, dw in zip(
            self.features, names,
            self.weights.agree_micro, self.weights.disagree_micro,
        ):
            sim = cmp_.expr(F.col(f"l.{cmp_.column}"), F.col(f"r.{cmp_.column}"))
            gamma = F.coalesce(
                (sim >= F.lit(thresh)).cast("int"), F.lit(0)
            )
            cols.append(gamma.alias(name))
            score = score + F.when(gamma == 1, F.lit(aw)).otherwise(F.lit(dw))
        out = joined.select(*cols, score.alias("score_micro"))
        if self.threshold_micro is not None:
            out = out.where(F.col("score_micro") >= F.lit(self.threshold_micro))
        return out


def train_fs_em(
    gammas: DataFrame,
    gamma_cols: list[str],
    iters: int = 25,
    lam0: float = 0.1,
    m0: float = 0.9,
    u0: float = 0.1,
    eps: float = 1e-6,
) -> FSWeights:
    """EM for m/u over the agreement-pattern histogram.

    ``gammas`` carries one 0/1 column per feature. The groupBy collapses
    the corpus to <= 2^k pattern rows (map-side combinable) before the
    only collect; EM then iterates driver-side on that histogram —
    identical results at any scale or partitioning.
    """
    if not gamma_cols:
        raise ValueError("gamma_cols must be non-empty")
    hist = (
        gammas.groupBy(*[F.col(c).cast("int").alias(c) for c in gamma_cols])
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if not hist:
        raise ValueError("no pairs to train on")
    # sorted so float accumulation order (and thus the result) is
    # independent of collect/partition order
    patterns = sorted(
        ([int(r[c]) for c in gamma_cols], int(r["n"])) for r in hist
    )
    k = len(gamma_cols)
    m = [m0] * k
    u = [u0] * k
    lam = lam0

    def clamp(p: float) -> float:
        return min(max(p, eps), 1.0 - eps)

    for _ in range(iters):
        tot_w = tot_n = 0.0
        m_num = [0.0] * k
        u_num = [0.0] * k
        for gam, n in patterns:
            pm = lam
            pu = 1.0 - lam
            for i, g in enumerate(gam):
                pm *= m[i] if g else (1.0 - m[i])
                pu *= u[i] if g else (1.0 - u[i])
            w = pm / (pm + pu) if pm + pu > 0 else 0.0
            tot_w += n * w
            tot_n += n
            for i, g in enumerate(gam):
                if g:
                    m_num[i] += n * w
                    u_num[i] += n * (1.0 - w)
        lam = clamp(tot_w / tot_n)
        m = [clamp(m_num[i] / tot_w) if tot_w > 0 else m[i] for i in range(k)]
        u = [
            clamp(u_num[i] / (tot_n - tot_w)) if tot_n > tot_w else u[i]
            for i in range(k)
        ]
    return FSWeights(m=m, u=u, lam=lam)
