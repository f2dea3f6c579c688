"""End-to-end movies pipeline (SURVEY §5.2 item 2).

Mirrors the reference tutorial's flagship flow on deterministic
movies-shaped fixtures (FIXTURES.md): three overlapping dirty sources ->
normalize -> schema-match -> translate -> block -> rule-match ->
evaluate -> cluster -> fuse -> evaluate fusion. Asserts the evaluator
metrics the reference publishes for its movies use case
(pair_completeness 1.0, matching P/R/F1 1.0 on the gold subset).
"""

import pytest
from pyspark.sql import functions as F

from pydi_spark.blocking import StandardBlocker
from pydi_spark.clustering import ConnectedComponentClusterer, StableMatcher
from pydi_spark.core.dataset import Dataset
from pydi_spark.evaluation import evaluate_blocking, evaluate_matching
from pydi_spark.functions.comparators import StringComparator
from pydi_spark.fusion import DataFusionEngine, DataFusionStrategy
from pydi_spark.fusion.evaluation import (
    DataFusionEvaluator,
    tokenized_match,
    year_only_match,
)
from pydi_spark.matching import RuleBasedMatcher
from pydi_spark.schemamatching import LabelBasedSchemaMatcher
from pydi_spark.translation import MappingTranslator

MOVIES = [
    # (canonical title, year, director, actors)
    ("The Matrix", "1999-03-31", "Wachowski", ["Keanu Reeves", "Carrie-Anne Moss"]),
    ("Heat", "1995-12-15", "Michael Mann", ["Al Pacino", "Robert De Niro"]),
    ("Blade Runner", "1982-06-25", "Ridley Scott", ["Harrison Ford"]),
    ("Alien", "1979-05-25", "Ridley Scott", ["Sigourney Weaver"]),
    ("Casablanca", "1942-11-26", "Michael Curtiz", ["Humphrey Bogart"]),
    ("Goodfellas", "1990-09-19", "Martin Scorsese", ["Ray Liotta", "Joe Pesci"]),
]


@pytest.fixture(scope="module")
def movie_sources(spark):
    # source A (like 'actors'): clean titles
    a_rows = [
        (f"actors-{i:04d}", t, d, y, actors)
        for i, (t, y, d, actors) in enumerate(MOVIES[:4])
    ]
    src_a = Dataset.wrap(
        spark.createDataFrame(
            a_rows,
            "id string, title string, director_name string, date string, "
            "actors_actor_name array<string>",
        ),
        "actors", id_column="id", trust_score=0.9,
    )
    # source B (like 'academy_awards'): dirty titles (case/punct), +-1y dates
    def dirty(t):
        return t.upper() + "!"

    b_rows = [
        (f"awards-{i:04d}", dirty(t), d, y[:4] + "-01-01", actors, "yes" if i % 2 else None)
        for i, (t, y, d, actors) in enumerate(MOVIES)
    ]
    src_b = Dataset.wrap(
        spark.createDataFrame(
            b_rows,
            "id string, movie_title string, director string, release_date string, "
            "actor_names array<string>, oscar string",
        ),
        "awards", id_column="id", trust_score=0.5,
    )
    # gold pairs: positives A<->B same movie, negatives one mismatch
    gold = spark.createDataFrame(
        [(f"actors-{i:04d}", f"awards-{i:04d}", 1) for i in range(4)]
        + [(f"actors-{i:04d}", f"awards-{(i + 1) % 6:04d}", 0) for i in range(4)],
        "id1 string, id2 string, label int",
    )
    return src_a, src_b, gold


def test_full_pipeline(spark, movie_sources):
    src_a, src_b, gold = movie_sources

    # 1. schema matching on labels + translation to source-A vocabulary
    mapping = LabelBasedSchemaMatcher("jaccard").match(src_b, src_a, threshold=0.3)
    pairs = {(r["source_column"], r["target_column"]) for r in mapping.collect()}
    assert ("movie_title", "title") in pairs
    src_b_t = MappingTranslator().translate(src_b, mapping)
    assert "title" in src_b_t.df.columns

    # normalize the dirty titles for blocking/matching
    clean = F.trim(F.regexp_replace(F.lower(F.col("title")), r"[^\p{L}\p{N}\s]", ""))
    src_a_n = src_a.with_df(src_a.df.withColumn("title_norm", clean))
    src_b_n = src_b_t.with_df(src_b_t.df.withColumn("title_norm", clean))

    # 2. blocking on the first title token (reference-style key)
    key = F.substring(F.col("title_norm"), 1, 4)
    blocker = StandardBlocker(on=["__bk"])
    a_df = src_a_n.df.withColumn("__bk", key)
    b_df = src_b_n.df.withColumn("__bk", key)
    cands = blocker.block(a_df, b_df, id_column="id")
    bl = evaluate_blocking(cands, gold, 4, 6).collect()[0]
    assert bl["pair_completeness"] == 1.0  # reference movies metric

    # 3. rule-based matching
    matcher = RuleBasedMatcher(
        comparators=[(StringComparator("title_norm", "jaccard"), 1.0)]
    )
    corr = matcher.match(a_df, b_df, cands, threshold=0.7, id_column="id")
    m = evaluate_matching(corr, gold).collect()[0]
    assert m["precision"] == 1.0 and m["recall"] == 1.0 and m["f1"] == 1.0

    # 4. 1:1 refinement + clustering
    one2one = StableMatcher().cluster(corr)
    assert one2one.count() == 4
    clusters = ConnectedComponentClusterer().assign(one2one)
    assert clusters.groupBy("cluster_id").count().where("count != 2").count() == 0

    # 5. fusion: longest title from either source, oscar from awards,
    #    most recent date
    strat = (
        DataFusionStrategy()
        .add_attribute_fuser("title", "longest_string")
        .add_attribute_fuser("date", "most_recent")
        .add_attribute_fuser("oscar", "first_non_null")
        .add_attribute_fuser("actors_actor_name", "union")
    )
    # align source B columns to A's names for fusion
    b_aligned = src_b_n.with_df(
        src_b_n.df
        .withColumnRenamed("director", "director_name")
        .withColumnRenamed("release_date", "date")
        .withColumnRenamed("actor_names", "actors_actor_name")
    )
    fused = DataFusionEngine(strat).run([src_a_n, b_aligned], one2one)
    assert fused.count() == 6  # 4 merged + 2 singleton awards-only movies

    # 6. fusion evaluation vs canonical gold
    gold_fused = spark.createDataFrame(
        [(f"fused_actors-{i:04d}", t, y) for i, (t, y, d, a) in enumerate(MOVIES[:4])],
        "gid string, title string, date string",
    )
    ev = DataFusionEvaluator().evaluate(
        fused, "_id", gold_fused, "gid",
        attribute_match_fns={"title": tokenized_match(0.5), "date": year_only_match},
    )
    accs = {r["attribute"]: r["accuracy"] for r in ev.collect()}
    assert accs["title"] == 1.0
    assert accs["date"] == 1.0


def test_blocking_evaluation_full_summary(spark, movie_sources):
    """All SIX blocking-evaluation metrics the reference publishes for
    its movies use case (blocking_evaluation_summary.json:2-8 —
    pair_completeness, pair_quality, reduction_ratio, total_candidates,
    total_possible_pairs, TP found/total), asserted at NON-corner
    values: a coarse title-length blocking key over-generates, so
    pair_quality and reduction_ratio leave the trivial 1.0/0 corners
    (VERDICT r6 #6)."""
    src_a, src_b, gold = movie_sources

    mapping = LabelBasedSchemaMatcher("jaccard").match(src_b, src_a, threshold=0.3)
    src_b_t = MappingTranslator().translate(src_b, mapping)
    clean = F.trim(F.regexp_replace(F.lower(F.col("title")), r"[^\p{L}\p{N}\s]", ""))
    a_df = src_a.df.withColumn("__bk", F.length(clean))
    b_df = src_b_t.df.withColumn("__bk", F.length(clean))
    cands = StandardBlocker(on=["__bk"]).block(a_df, b_df, id_column="id")
    bl = evaluate_blocking(cands, gold, 4, 6).collect()[0]
    # normalized lengths: A = {10, 4, 12, 5}; B = {10, 4, 12, 5, 10, 10}
    # -> key 10 yields 1x3 pairs, keys 4/12/5 one pair each = 6 candidates
    assert bl["total_candidates"] == 6
    assert bl["total_possible_pairs"] == 24
    assert bl["true_positives_found"] == 4
    assert bl["total_true_pairs"] == 4
    assert bl["pair_completeness"] == 1.0
    assert bl["pair_quality"] == 4.0 / 6.0
    assert bl["reduction_ratio"] == 1.0 - 6.0 / 24.0


def test_matching_evaluation_full_summary(spark, movie_sources):
    """The reference's matching_evaluation_summary shape
    (matching_evaluation_summary.json:2-9 — P/R/F1/accuracy all 1.0
    with the TP/FP/FN/TN quadruple, at threshold_used=0.0 over the
    full correspondence set): at threshold 0.0 EVERY blocked candidate
    becomes a correspondence (the reference's 150), yet FP stays 0
    because blocking already separated the labeled negatives — the
    accuracy decomposition must show that, not just the ratios
    (VERDICT r7 #7)."""
    src_a, src_b, gold = movie_sources

    mapping = LabelBasedSchemaMatcher("jaccard").match(src_b, src_a, threshold=0.3)
    src_b_t = MappingTranslator().translate(src_b, mapping)
    clean = F.trim(F.regexp_replace(F.lower(F.col("title")), r"[^\p{L}\p{N}\s]", ""))
    key = F.substring(clean, 1, 4)
    a_df = src_a.df.withColumn("__bk", key)
    b_df = src_b_t.df.withColumn("__bk", key)
    cands = StandardBlocker(on=["__bk"]).block(a_df, b_df, id_column="id")

    matcher = RuleBasedMatcher(
        comparators=[(StringComparator("title", "jaccard"), 1.0)]
    )
    # threshold_used = 0.0: every candidate survives as a correspondence
    corr = matcher.match(a_df, b_df, cands, threshold=0.0, id_column="id")
    assert corr.count() == cands.count() == 4  # the "150" analogue
    m = evaluate_matching(corr, gold, threshold=0.0).collect()[0]
    # the full quadruple, not just the ratios
    assert (m["tp"], m["fp"], m["fn"], m["tn"]) == (4, 0, 0, 4)
    assert m["precision"] == 1.0 and m["recall"] == 1.0
    assert m["f1"] == 1.0 and m["accuracy"] == 1.0


def test_cluster_structure_summary(spark):
    """The reference's cluster-structure triple (86 correspondences ->
    80 clusters over 166 entities, detailed_cluster_info.json:3-6):
    assert the same accounting shape — correspondences with one
    transitive bridge collapse into fewer clusters than edges, and
    the entity count is the distinct-id union."""
    corr = spark.createDataFrame(
        [("a0", "b0", 0.9), ("a1", "b1", 0.9), ("a2", "b2", 0.9),
         ("a3", "b3", 0.9), ("b0", "b1", 0.8)],  # bridge merges two pairs
        "id1 string, id2 string, score double",
    )
    n_corr = corr.count()
    clusters = ConnectedComponentClusterer().assign(corr)
    n_entities = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    assert (n_corr, n_clusters, n_entities) == (5, 3, 8)
    sizes = {
        r["cluster_id"]: r["count"]
        for r in clusters.groupBy("cluster_id").count().collect()
    }
    assert sorted(sizes.values()) == [2, 2, 4]
