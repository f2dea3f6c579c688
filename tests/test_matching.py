"""Matchers: rule-based scoring, features, ML bridge, text formatting."""

import pytest
from pyspark.sql import functions as F

from pydi_spark.blocking import NoBlocker
from pydi_spark.functions.comparators import (
    DateComparator,
    NumericComparator,
    StringComparator,
)
from pydi_spark.matching import (
    FeatureExtractor,
    MLBasedMatcher,
    RuleBasedMatcher,
    TextFormatter,
)


@pytest.fixture(scope="module")
def two_tables(spark):
    left = spark.createDataFrame(
        [("l1", "alpha beta", 10.0, "2020-01-01"),
         ("l2", "gamma delta", 20.0, "2021-06-15")],
        "rid string, name string, val double, d string",
    )
    right = spark.createDataFrame(
        [("r1", "alpha beta", 11.0, "2020-03-01"),
         ("r2", "epsilon", 99.0, "1999-01-01")],
        "rid string, name string, val double, d string",
    )
    return left, right


def test_rule_matcher_weighted_score(spark, two_tables):
    left, right = two_tables
    pairs = NoBlocker().block(left, right, id_column="rid")
    m = RuleBasedMatcher(
        comparators=[
            (StringComparator("name", "jaccard"), 0.5),
            (NumericComparator("val", max_difference=10.0), 0.3),
            (DateComparator("d", max_days_difference=365.0), 0.2),
        ]
    )
    out = {(r["id1"], r["id2"]): r["score"] for r in
           m.match(left, right, pairs, threshold=0.0, id_column="rid").collect()}
    # l1-r1: jaccard 1.0, numeric 1-1/10=0.9, date 1-60/365
    expected = 0.5 * 1.0 + 0.3 * 0.9 + 0.2 * (1 - 60 / 365)
    assert out[("l1", "r1")] == pytest.approx(expected, abs=1e-6)
    assert out[("l2", "r2")] < 0.1


def test_rule_matcher_threshold_and_debug(spark, two_tables):
    left, right = two_tables
    pairs = NoBlocker().block(left, right, id_column="rid")
    m = RuleBasedMatcher(comparators=[(StringComparator("name", "jaccard"), 1.0)])
    out = m.match(left, right, pairs, threshold=0.9, id_column="rid", debug=True)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["id1"] == "l1"
    assert "sim_name_0" in out.columns


def test_feature_extractor(spark, two_tables):
    left, right = two_tables
    pairs = NoBlocker().block(left, right, id_column="rid")
    fx = FeatureExtractor(
        [StringComparator("name", "jaccard"), NumericComparator("val")]
    )
    feats = fx.create_features(left, right, pairs, id_column="rid")
    assert set(feats.columns) == {"id1", "id2", "feat_name_0", "feat_val_1"}
    assert feats.count() == 4


def test_ml_matcher_with_stub(spark, two_tables):
    class _StubModel:
        """sklearn-shaped stub, defined in function scope so cloudpickle
        ships the class by value (scikit-learn is not a baked dep)."""

        def fit(self, X, y):
            self.threshold = 0.5
            return self

        def predict_proba(self, X):
            import numpy as np

            p = (X[:, 0] >= 0.5).astype(float)
            return np.stack([1 - p, p], axis=1)

    left, right = two_tables
    pairs = NoBlocker().block(left, right, id_column="rid")
    fx = FeatureExtractor([StringComparator("name", "jaccard")])
    m = MLBasedMatcher(fx, model=_StubModel())
    out = m.match(left, right, pairs, threshold=0.5, id_column="rid")
    assert {(r["id1"], r["id2"]) for r in out.collect()} == {("l1", "r1")}


def test_text_formatter(spark, two_tables):
    left, _ = two_tables
    fmt = TextFormatter(["name", "val"], separator=" | ")
    row = left.select(fmt.expr().alias("t")).collect()[0]
    assert row["t"] == "alpha beta | 10.0"
    tmpl = TextFormatter(["name"], template="name is {name}")
    row2 = left.select(tmpl.expr().alias("t")).collect()[0]
    assert row2["t"] == "name is alpha beta"


def test_string_comparator_list_strategies(spark):
    df = spark.createDataFrame(
        [(["alice smith", "a. smith"], ["alice smith", "bob jones"])],
        "l array<string>, r array<string>",
    )
    from pydi_spark.functions.comparators import StringComparator

    def run(strategy, fn="jaccard"):
        cmp_ = StringComparator("x", fn, list_strategy=strategy)
        return df.select(cmp_.expr(F.col("l"), F.col("r")).alias("s")).collect()[0]["s"]

    assert run("set_jaccard") == pytest.approx(1 / 3)   # share 1 of 3 distinct
    assert run("set_overlap") == pytest.approx(1 / 2)   # 1 / min(2,2)
    assert run("best_match", "levenshtein") == 1.0      # exact member match
    concat = run("concatenate")                          # jaccard of joined text
    assert 0 < concat < 1


def test_date_comparator_list_strategies(spark):
    df = spark.createDataFrame(
        [(["2020-01-01", "2021-06-01"], ["2020-01-11", "1999-01-01"])],
        "l array<string>, r array<string>",
    )
    from pydi_spark.functions.comparators import DateComparator

    def run(strategy):
        cmp_ = DateComparator("x", max_days_difference=100.0, list_strategy=strategy)
        return df.select(cmp_.expr(F.col("l"), F.col("r")).alias("s")).collect()[0]["s"]

    assert run("closest_dates") == pytest.approx(1 - 10 / 100)  # 2020-01-01 vs 01-11
    assert run("earliest_dates") == pytest.approx(0.0)          # 2020 vs 1999 clamps
    assert run("latest_dates") == pytest.approx(0.0)            # 2021-06 vs 2020-01
    assert 0.0 <= run("range_overlap") <= 1.0


def test_numeric_comparator_list_strategies(spark):
    df = spark.createDataFrame(
        [(
            [10.0, 20.0],
            [20.0, 40.0],
        )],
        "l array<double>, r array<double>",
    )
    from pydi_spark.functions.comparators import NumericComparator

    def run(strategy):
        cmp_ = NumericComparator("x", max_difference=30.0, list_strategy=strategy)
        return df.select(cmp_.expr(F.col("l"), F.col("r")).alias("s")).collect()[0]["s"]

    assert run("best_match") == 1.0                     # 20 vs 20
    assert run("average") == pytest.approx(1 - 15 / 30) # 15 vs 30
    assert run("range_overlap") == pytest.approx(0.0)   # [10,20] vs [20,40]: inter 0/span 30


def test_string_comparator_best_match_python_tier(spark):
    from pydi_spark.functions.comparators import StringComparator

    df = spark.createDataFrame(
        [(["Acme Corp", "ACME"], ["Acme Corporation"]),
         (["Widget"], ["Gadget", "Widgets Inc"])],
        "l array<string>, r array<string>",
    )
    # jaro_winkler has no native expression: best_match must route it
    # through the Arrow-batched UDF instead of failing at analysis time
    c = StringComparator("x", "jaro_winkler", list_strategy="best_match")
    from pyspark.sql import functions as F
    vals = [r[0] for r in df.select(c.expr(F.col("l"), F.col("r"))).collect()]
    assert all(0.0 < v <= 1.0 for v in vals)
    # a python callable works too
    c2 = StringComparator("x", lambda a, b: 1.0 if a[0] == b[0] else 0.0,
                          list_strategy="best_match")
    vals2 = [r[0] for r in df.select(c2.expr(F.col("l"), F.col("r"))).collect()]
    assert vals2 == [1.0, 1.0]  # 'Acme...'/'ACME' no—first-char A==A; W==W or G


def test_uncertainty_band(spark):
    from pydi_spark.matching import uncertainty_band

    rows = [("a", "b", 0.52), ("c", "d", 0.49), ("e", "f", 0.9),
            ("g", "h", 0.45), ("i", "j", 0.1)]
    df = spark.createDataFrame(rows, "id1 string, id2 string, score double")
    out = uncertainty_band(df, threshold=0.5, band=0.05)
    assert {(r["id1"], r["id2"]) for r in out.collect()} == {
        ("a", "b"), ("c", "d"), ("g", "h")}
    top = uncertainty_band(df, threshold=0.5, band=0.05, max_pairs=2).collect()
    assert [r["id1"] for r in sorted(top, key=lambda r: r["rank"])] == ["c", "a"]


# ----------------------------------------------------- Fellegi–Sunter

def test_fellegi_sunter_scoring_exact(spark):
    """score_micro is the exact integer sum of the per-gamma weights."""
    from pydi_spark.functions.comparators import (
        NumericComparator,
        StringComparator,
    )
    from pydi_spark.matching import FellegiSunterMatcher, fs_weights_from_mu

    L = spark.createDataFrame(
        [("1", "alpha", 10.0), ("2", "beta", 20.0), ("3", None, 30.0)],
        ["rid", "name", "bal"],
    )
    R = spark.createDataFrame(
        [("a", "alpha", 11.0), ("b", "betax", 500.0), ("c", "gamma", 30.0)],
        ["rid", "name", "bal"],
    )
    P = spark.createDataFrame(
        [("1", "a"), ("2", "b"), ("3", "c")], ["id1", "id2"]
    )
    w = fs_weights_from_mu([0.9, 0.8], [0.1, 0.2])
    m = FellegiSunterMatcher(
        features=[
            (StringComparator("name", "levenshtein"), 0.9),
            (NumericComparator("bal", max_difference=10.0), 0.5),
        ],
        weights=w,
    )
    rows = {r["id1"]: r for r in m.match(L, R, P, id_column="rid").collect()}
    aw, dw = w.agree_micro, w.disagree_micro
    # pair 1-a: names equal (sim 1.0), |10-11|=1 -> bal sim 0.9 >= 0.5
    assert (rows["1"]["gamma_name"], rows["1"]["gamma_bal"]) == (1, 1)
    assert rows["1"]["score_micro"] == aw[0] + aw[1]
    # pair 2-b: 'beta'/'betax' sim 0.8 < 0.9 disagree; bal far apart
    assert (rows["2"]["gamma_name"], rows["2"]["gamma_bal"]) == (0, 0)
    assert rows["2"]["score_micro"] == dw[0] + dw[1]
    # pair 3-c: null name -> gamma 0 (null disagrees); bal exact agree
    assert (rows["3"]["gamma_name"], rows["3"]["gamma_bal"]) == (0, 1)
    assert rows["3"]["score_micro"] == dw[0] + aw[1]
    # threshold filter keeps only the full-agreement pair
    m2 = FellegiSunterMatcher(
        features=m.features, weights=w, threshold_micro=aw[0]
    )
    kept = m2.match(L, R, P, id_column="rid").collect()
    assert [r["id1"] for r in kept] == ["1"]


def test_fellegi_sunter_em_recovers_mixture(spark):
    """EM on a two-class synthetic histogram recovers m/u/lambda.

    Three features minimum: with k=2 the model is under-identified
    (2^2 - 1 = 3 degrees of freedom < 5 parameters)."""
    import random

    from pydi_spark.matching import train_fs_em

    rng = random.Random(7)
    m_true, u_true = [0.92, 0.85, 0.7], [0.08, 0.2, 0.3]
    rows = []
    for _ in range(6000):
        p = m_true if rng.random() < 0.3 else u_true
        rows.append(tuple(1 if rng.random() < pi else 0 for pi in p))
    df = spark.createDataFrame(rows, "g1 int, g2 int, g3 int")
    w = train_fs_em(df, ["g1", "g2", "g3"], iters=60)
    assert abs(w.lam - 0.3) < 0.08
    assert all(abs(mi - ti) < 0.1 for mi, ti in zip(w.m, m_true))
    assert all(abs(ui - ti) < 0.1 for ui, ti in zip(w.u, u_true))
    # agreement weights positive, disagreement negative
    assert all(a > 0 for a in w.agree_micro)
    assert all(d < 0 for d in w.disagree_micro)


def test_fellegi_sunter_validation(spark):
    import pytest as _pytest

    from pydi_spark.matching import fs_weights_from_mu

    with _pytest.raises(ValueError):
        fs_weights_from_mu([0.9], [0.1, 0.2])
    with _pytest.raises(ValueError):
        fs_weights_from_mu([1.0], [0.1])
