"""Similarity registry: native-vs-python agreement + metric properties."""

import pytest
from pyspark.sql import functions as F

from pydi_spark.functions import metrics_py
from pydi_spark.functions.similarity import NATIVE_METRICS, PY_METRICS, similarity

CASES = [
    ("hello world", "hello there"),
    ("kitten", "sitting"),
    ("abc", "abc"),
    ("", ""),
    ("a", ""),
    ("the quick brown fox", "the quick red fox"),
    ("Customer#000000001", "Customer#000000010"),
    # case-differing pair: prefix/postfix are case-SENSITIVE in both
    # tiers (the native tier once lowercased — advisor-found divergence)
    ("ABC", "abcd"),
]


@pytest.fixture(scope="module")
def pairs_df(spark):
    return spark.createDataFrame(CASES, "a string, b string")


@pytest.mark.parametrize("name", sorted(set(NATIVE_METRICS) & set(PY_METRICS)))
def test_native_matches_python(spark, pairs_df, name):
    """The native expression tier must agree with the pure-Python tier."""
    rows = pairs_df.select(
        "a", "b",
        similarity(name, "a", "b").alias("nat"),
        similarity(name, "a", "b", force_python=True).alias("py"),
    ).collect()
    for r in rows:
        if r["nat"] is None or r["py"] is None:
            assert r["nat"] == r["py"], (name, r["a"], r["b"])
        else:
            assert abs(r["nat"] - r["py"]) < 1e-9, (name, r["a"], r["b"], r["nat"], r["py"])


@pytest.mark.parametrize("name", sorted(PY_METRICS))
def test_python_metric_properties(name):
    fn = PY_METRICS[name]
    for a, b in CASES:
        v = fn(a, b)
        assert 0.0 <= v <= 1.0 + 1e-9, (name, a, b, v)
        # symmetry holds for all these metrics except directed ones
        if name not in ("monge_elkan", "tversky", "prefix", "postfix"):
            assert abs(fn(a, b) - fn(b, a)) < 1e-9, (name, a, b)
    assert fn("samestring", "samestring") == pytest.approx(1.0), name


def test_levenshtein_known():
    assert metrics_py.levenshtein_dist("kitten", "sitting") == 3
    assert metrics_py.jaro_winkler("martha", "marhta") == pytest.approx(0.9611, abs=1e-3)


def test_custom_callable(spark, pairs_df):
    out = pairs_df.select(
        similarity(lambda x, y: 1.0 if x == y else 0.25, "a", "b").alias("s")
    ).collect()
    assert out[2]["s"] == 1.0
    assert out[0]["s"] == 0.25


def test_unknown_metric_raises(pairs_df):
    with pytest.raises(ValueError):
        pairs_df.select(similarity("no_such_metric", "a", "b"))
