"""IE evaluation: align predictions and gold by id, per-attribute P/R/F1.

Reference: InformationExtractionEvaluator (PyDI/informationextraction/
evaluation.py:121-338): join on id, per-attribute match fn (default
exact, pluggable), micro/macro P/R/F1 + non-null accuracy (:85-118).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class InformationExtractionEvaluator:
    def evaluate(
        self,
        pred: DataFrame,
        gold: DataFrame,
        id_column: str,
        attributes: list[str] | None = None,
        match_fns: dict[str, Callable[[Column, Column], Column]] | None = None,
    ) -> dict:
        attrs = attributes or [
            c for c in pred.columns if c != id_column and c in gold.columns
        ]
        match_fns = match_fns or {}
        joined = pred.alias("p").join(
            gold.alias("g"),
            F.col(f"p.{id_column}").cast("string") == F.col(f"g.{id_column}").cast("string"),
        )
        aggs = []
        for a in attrs:
            pcol, gcol = F.col(f"p.{a}"), F.col(f"g.{a}")
            fn = match_fns.get(a, lambda l, r: l.cast("string") == r.cast("string"))
            tp = F.count(F.when(pcol.isNotNull() & gcol.isNotNull() & fn(pcol, gcol), 1))
            fp = F.count(
                F.when(pcol.isNotNull() & (gcol.isNull() | ~fn(pcol, gcol)), 1)
            )
            fn_ = F.count(F.when(pcol.isNull() & gcol.isNotNull(), 1))
            aggs += [tp.alias(f"__tp_{a}"), fp.alias(f"__fp_{a}"), fn_.alias(f"__fn_{a}")]
        row = joined.agg(*aggs).collect()[0]

        per_attr = {}
        tot_tp = tot_fp = tot_fn = 0
        f1s = []
        for a in attrs:
            tp, fp, fn_ = row[f"__tp_{a}"], row[f"__fp_{a}"], row[f"__fn_{a}"]
            tot_tp += tp; tot_fp += fp; tot_fn += fn_
            p = tp / (tp + fp) if (tp + fp) else None
            r = tp / (tp + fn_) if (tp + fn_) else None
            f1 = 2 * p * r / (p + r) if p and r else 0.0
            per_attr[a] = {"precision": p, "recall": r, "f1": f1,
                           "tp": tp, "fp": fp, "fn": fn_}
            f1s.append(f1)
        micro_p = tot_tp / (tot_tp + tot_fp) if (tot_tp + tot_fp) else None
        micro_r = tot_tp / (tot_tp + tot_fn) if (tot_tp + tot_fn) else None
        micro_f1 = (
            2 * micro_p * micro_r / (micro_p + micro_r) if micro_p and micro_r else 0.0
        )
        return {
            "per_attribute": per_attr,
            "micro": {"precision": micro_p, "recall": micro_r, "f1": micro_f1},
            "macro": {"f1": sum(f1s) / len(f1s) if f1s else None},
        }
