"""Driver-contract sanity: entry(), queries()/oracle_sql() alignment."""

import __spark_entry__ as entry


def test_entry_returns_rows(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert {"id1", "id2", "score"} <= set(df.columns)


def test_queries_oracles_aligned():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert qs, "no queries registered"
    # every oracle refers to a registered query
    assert set(oracles) <= set(qs)
    # every query has an oracle except declared rows-only ops (the driver
    # records a weaker check for those)
    ROWS_ONLY = {"ann_lsh", "ann_ivf"}
    missing = set(qs) - set(oracles) - ROWS_ONLY
    assert not missing, f"queries without oracle: {missing}"


def test_two_sample_queries_run(spark, sf_dir):
    qs = entry.queries()
    assert qs["tpch_q1"](spark, sf_dir).count() > 0
    out = qs["blocking_standard"](spark, sf_dir)
    assert out.columns == ["id1", "id2", "block_key"]
