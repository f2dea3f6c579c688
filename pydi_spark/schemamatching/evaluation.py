"""Schema-mapping evaluation: P/R/F1 over column pairs.

Reference: SchemaMappingEvaluator (PyDI/schemamatching/evaluation.py:
19-191) + sweep_thresholds. Column-pair sets are tiny -> driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _pair_set(df: DataFrame) -> set[tuple[str, str]]:
    return {
        (r["source_column"], r["target_column"])
        for r in df.select("source_column", "target_column").collect()
    }


class SchemaMappingEvaluator:
    @staticmethod
    def evaluate(correspondences: DataFrame, gold: DataFrame) -> dict:
        pred = _pair_set(correspondences)
        truth = _pair_set(gold)
        tp = len(pred & truth)
        fp = len(pred - truth)
        fn = len(truth - pred)
        precision = tp / (tp + fp) if (tp + fp) else None
        recall = tp / (tp + fn) if (tp + fn) else None
        f1 = (
            2 * precision * recall / (precision + recall)
            if precision and recall
            else 0.0
        )
        return {
            "precision": precision, "recall": recall, "f1": f1,
            "tp": tp, "fp": fp, "fn": fn,
        }

    @staticmethod
    def sweep_thresholds(
        correspondences: DataFrame, gold: DataFrame,
        thresholds: list[float] | None = None,
    ) -> list[dict]:
        thresholds = thresholds or [round(0.1 * i, 1) for i in range(11)]
        rows = correspondences.select(
            "source_column", "target_column", "score"
        ).collect()
        truth = _pair_set(gold)
        out = []
        for t in thresholds:
            pred = {
                (r["source_column"], r["target_column"])
                for r in rows
                if (r["score"] or 0) >= t
            }
            tp, fp, fn = len(pred & truth), len(pred - truth), len(truth - pred)
            precision = tp / (tp + fp) if (tp + fp) else None
            recall = tp / (tp + fn) if (tp + fn) else None
            f1 = (
                2 * precision * recall / (precision + recall)
                if precision and recall
                else 0.0
            )
            out.append({"threshold": t, "precision": precision,
                        "recall": recall, "f1": f1})
        return out
