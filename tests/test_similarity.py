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


def test_global_running_sum_matches_single_partition(spark):
    from pyspark.sql import functions as F

    from pydi_spark.functions import global_running_sum

    df = spark.createDataFrame(
        [(i, (i * 37) % 100) for i in range(200)], "k long, v long"
    ).repartition(13)
    got = {r["k"]: r["running_sum"] for r in
           global_running_sum(df, ["k"], "v").collect()}
    rows = sorted([((i), (i * 37) % 100) for i in range(200)])
    acc, want = 0, {}
    for k, v in rows:
        acc += v
        want[k] = acc
    assert got == want


def test_rank_normalize_percent_rank_semantics(spark):
    from pydi_spark.functions import rank_normalize

    # values: 10 x1, 20 x2, 30 x1 -> percent_rank 0, 250000, 750000
    df = spark.createDataFrame(
        [("a", 10), ("b", 20), ("c", 20), ("d", 30), ("e", None)],
        "id string, x int",
    )
    got = {r["id"]: r["pct_ppm"] for r in rank_normalize(df, "x").collect()}
    # n=4 non-null: below counts 0, 1, 1, 3 over n-1=3
    assert got["a"] == 0
    assert got["b"] == got["c"] == 333_333     # ties share the rank
    assert got["d"] == 1_000_000
    assert got["e"] is None                    # NULL passes through
    # all-equal column maps to 0
    eq = spark.createDataFrame([(1, 5), (2, 5)], "id int, x int")
    assert {r["pct_ppm"] for r in rank_normalize(eq, "x").collect()} == {0}
    # partition independence
    got29 = {r["id"]: r["pct_ppm"]
             for r in rank_normalize(df.repartition(29), "x").collect()}
    assert got29 == got


def test_top_k_per_group(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pydi_spark.functions import top_k_per_group

    df = spark.createDataFrame(
        [("g1", 3, "a"), ("g1", 1, "b"), ("g1", 2, "c"),
         ("g2", 9, "d"), ("g2", 8, "e")],
        "g string, score int, id string",
    )
    got = {(r["g"], r["rank_in_group"]): r["id"] for r in top_k_per_group(
        df, ["g"], [F.desc("score"), "id"], k=2).collect()}
    assert got == {("g1", 1): "a", ("g1", 2): "c",
                   ("g2", 1): "d", ("g2", 2): "e"}
    with _pytest.raises(ValueError, match="k must"):
        top_k_per_group(df, ["g"], ["score"], k=0)
