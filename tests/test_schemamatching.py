"""Schema matching: label, instance, duplicate-based + translation."""

import pytest
from pyspark.sql import functions as F

from pydi_spark.core.dataset import Dataset
from pydi_spark.schemamatching import (
    DuplicateBasedSchemaMatcher,
    InstanceBasedSchemaMatcher,
    LabelBasedSchemaMatcher,
    SchemaMappingEvaluator,
)
from pydi_spark.translation import MappingTranslator


@pytest.fixture(scope="module")
def tables(spark):
    src = Dataset.wrap(
        spark.createDataFrame(
            [("s1", "The Matrix", "Wachowski", "1999"),
             ("s2", "Heat", "Mann", "1995"),
             ("s3", "Blade Runner", "Scott", "1982")],
            "sid string, movie_title string, director_name string, release_year string",
        ),
        "src", id_column="sid",
    )
    tgt = Dataset.wrap(
        spark.createDataFrame(
            [("t1", "The Matrix", "Wachowski", "1999"),
             ("t2", "Heat", "Mann", "1995"),
             ("t3", "Alien", "Scott", "1979")],
            "tid string, title string, director string, year string",
        ),
        "tgt", id_column="tid",
    )
    return src, tgt


def mapping_pairs(df):
    return {(r["source_column"], r["target_column"]) for r in df.collect()}


def test_label_based(tables):
    src, tgt = tables
    out = LabelBasedSchemaMatcher("jaccard").match(src, tgt, threshold=0.4)
    ps = mapping_pairs(out)
    assert ("movie_title", "title") in ps
    assert ("director_name", "director") in ps
    assert ("release_year", "year") in ps
    # id columns excluded from matching
    assert not any("sid" in p or "tid" in p for pair in ps for p in pair)


def test_instance_based(tables):
    src, tgt = tables
    out = InstanceBasedSchemaMatcher(similarity_function="cosine").match(
        src, tgt, threshold=0.3
    )
    ps = mapping_pairs(out)
    assert ("movie_title", "title") in ps
    assert ("director_name", "director") in ps
    assert ("release_year", "year") in ps
    assert ("movie_title", "year") not in ps


def test_duplicate_based(spark, tables):
    src, tgt = tables
    corr = spark.createDataFrame(
        [("s1", "t1", 1.0), ("s2", "t2", 1.0)], "id1 string, id2 string, score double"
    )
    out = DuplicateBasedSchemaMatcher(min_votes=2).match(src, tgt, corr, threshold=0.5)
    ps = mapping_pairs(out)
    assert ("movie_title", "title") in ps
    assert ("director_name", "director") in ps
    assert ("release_year", "year") in ps
    assert len(ps) == 3


def test_evaluator_and_translator(spark, tables):
    src, tgt = tables
    pred = LabelBasedSchemaMatcher("jaccard").match(src, tgt, threshold=0.4)
    gold = spark.createDataFrame(
        [("src", "movie_title", "tgt", "title", 1.0, ""),
         ("src", "director_name", "tgt", "director", 1.0, ""),
         ("src", "release_year", "tgt", "year", 1.0, "")],
        "source_dataset string, source_column string, target_dataset string, "
        "target_column string, score double, notes string",
    )
    m = SchemaMappingEvaluator.evaluate(pred, gold)
    assert m["recall"] == 1.0

    translated = MappingTranslator().translate(src, pred)
    assert "title" in translated.df.columns
    assert "director" in translated.df.columns
    assert translated.provenance["operations"][-1]["op"] == "schema_translate"
