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


def test_driver_window_arithmetic():
    """The driver records correctness for EXACTLY the first 50
    queries() entries (r03 shipped 51 in the 'first 50' group and
    silently pushed one query out — ADVICE r3). Pin the arithmetic:
    every query awaiting its first driver check sits inside the
    window, and the canaries hold their documented positions."""
    names = list(entry.queries())
    window = names[:50]
    assert len(set(window)) == 50
    # canaries at documented positions 13-14, round-5 probes at 15-16
    assert window[12] == "canary_hash_safe"
    assert window[13] == "canary_hash_risky"
    assert window[14] == "canary_hugeint"
    assert window[15] == "probe_corpus_echo"
    # every query that has never had a green driver row must be inside
    # the window: the 7 r04 reds (oracle sums re-cast to BIGINT this
    # round — the HUGEINT->float64 driver-hasher root cause) + the 22
    # rotated-in session-3 queries (the full NOTES.md round-5 rotation
    # queue) + the round-5 probes
    awaiting = {
        # r04 reds, fix = CAST(sum AS BIGINT) in the oracles
        "text_clean", "text_clean_multiline", "text_vocabulary",
        "text_budget_select", "text_inverted_index", "text_lm_score",
        "text_line_dedup",
        # round-5 probes
        "canary_hugeint", "probe_corpus_echo",
        # round-5 new operators
        "io_excel_roundtrip", "io_html_roundtrip", "units_convert",
        "normalize_locale",
        # session-3 rotation queue, fully rotated in this round
        "text_search_hybrid", "text_bpe_segment", "dedup_incremental",
        "sample_exact_k", "profile_key_skew", "io_orc_roundtrip",
        "text_rerank", "dedup_agreement", "text_vocab_coverage",
        "tpch_grouping_sets", "events_funnel", "events_retention",
        "events_json", "events_sessionize_batch", "graph_pagerank",
        "io_cdc_upsert", "text_bpe_fertility", "text_gram_duplication",
        "sample_split_leakage_safe", "sample_contrastive",
        "match_uncertainty", "text_blocklist",
    }
    outside = awaiting - set(window)
    assert not outside, f"awaiting first driver check but past 50: {outside}"
    # round-5 rotation queue: queries added this round that could not
    # claim a window slot (the 50 slots are full) — rotate into the
    # r6 window; keep this in sync when adding queries past 50.
    rotation_queue = {"text_span_remove", "blocking_progressive",
                      "io_pickle_roundtrip", "text_corpus_cleanup",
                      "dedup_lsh_recall"}
    past_window = set(names[50:])
    missing = rotation_queue - past_window - set(window)
    assert not missing, f"rotation-queue query vanished: {missing}"


def test_partition_independence_of_new_queries(spark):
    """Session-3 queries produce identical results under different
    shuffle-partition settings — the distributed-correctness property
    every oracle comparison silently relies on."""
    import __spark_entry__ as entry

    qs = entry.queries()
    sf = "/root/testdata/sf0.001"
    names = [
        "text_search_hybrid", "text_bpe_segment", "sample_exact_k",
        "profile_key_skew", "text_vocab_coverage", "events_funnel",
        "tpch_grouping_sets", "text_rerank", "events_retention",
        "events_json", "events_sessionize_batch", "graph_pagerank",
        "io_cdc_upsert", "text_bpe_fertility", "text_gram_duplication",
        "sample_split_leakage_safe", "sample_contrastive",
        "dedup_agreement", "dedup_incremental",
        # round-5 additions
        "text_span_remove", "blocking_progressive", "units_convert",
        "normalize_locale",
    ]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for n_part in ("5", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n_part)
            for name in names:
                rows = sorted(
                    tuple(r) for r in qs[name](spark, sf).collect()
                )
                if name in results:
                    assert results[name] == rows, f"{name} differs at {n_part}"
                else:
                    results[name] = rows
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
