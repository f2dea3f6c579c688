"""Evaluation operators: metrics math + sweep monotonicity."""

import pytest

from pydi_spark.evaluation import (
    cluster_consistency_report,
    cluster_size_distribution,
    evaluate_blocking,
    evaluate_matching,
    threshold_sweep,
)


@pytest.fixture(scope="module")
def labeled(spark):
    corr = spark.createDataFrame(
        [("a", "x", 0.9), ("b", "y", 0.8), ("c", "z", 0.4)],
        "id1 string, id2 string, score double",
    )
    gold = spark.createDataFrame(
        [("a", "x", 1), ("b", "y", 0), ("c", "z", 1), ("d", "w", 1)],
        "id1 string, id2 string, label int",
    )
    return corr, gold


def test_evaluate_blocking(spark, labeled):
    corr, gold = labeled
    out = evaluate_blocking(corr.select("id1", "id2"), gold, 4, 4).collect()[0]
    # gold positives: ax, cz, dw; candidates contain ax, cz -> PC=2/3
    assert out["pair_completeness"] == pytest.approx(2 / 3)
    assert out["pair_quality"] == pytest.approx(2 / 3)
    assert out["total_candidates"] == 3
    assert out["reduction_ratio"] == pytest.approx(1 - 3 / 16)


def test_evaluate_matching(spark, labeled):
    corr, gold = labeled
    out = evaluate_matching(corr, gold, threshold=0.5).collect()[0]
    # predicted: ax, by; tp=ax, fp=by, fn=cz+dw, tn=0
    assert out["tp"] == 1 and out["fp"] == 1 and out["fn"] == 2 and out["tn"] == 0
    assert out["precision"] == pytest.approx(0.5)
    assert out["recall"] == pytest.approx(1 / 3)


def test_threshold_sweep_monotone_recall(spark, labeled):
    corr, gold = labeled
    rows = threshold_sweep(corr, gold, [0.0, 0.5, 0.85, 1.0]).collect()
    recalls = [r["recall"] for r in rows]
    assert recalls == sorted(recalls, reverse=True)
    by_t = {r["threshold"]: r for r in rows}
    assert by_t[0.0]["tp"] == 2
    assert by_t[0.85]["tp"] == 1


def test_cluster_reports(spark):
    corr = spark.createDataFrame(
        [("a", "b", 0.9), ("b", "c", 0.8)], "id1 string, id2 string, score double"
    )
    rep = cluster_consistency_report(corr).collect()
    row = rep[0]
    assert row["n_entities"] == 3 and row["n_edges"] == 2
    assert row["consistency"] == pytest.approx(2 / 3)

    from pydi_spark.clustering import connected_components

    dist = cluster_size_distribution(
        connected_components(corr.select("id1", "id2"))
    ).collect()
    assert [(r["cluster_size"], r["n_clusters"]) for r in dist] == [(3, 1)]
