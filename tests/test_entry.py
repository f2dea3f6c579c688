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


# Round-7 rotation queue: queries added past position 50 because the
# window is already claimed by this round's first-checks — rotate into
# the NEXT round's window. Keep in sync when adding queries; the two
# tests below enforce the accounting. The r7 rotation emptied the
# round-6 queue (all 31 additions in-window; the first two round-7 new
# queries took free window slots directly); later round-7 additions
# queue here for r8.
ROTATION_QUEUE: set[str] = {
    "events_attribution",
    "profile_histogram",
    "events_active_users",
    "normalize_encode",
    "normalize_urls",
    "blocking_key_report",
    "streaming_distinct_users",
    "graph_triangles",
}


def test_driver_window_arithmetic():
    """The driver records correctness for EXACTLY the first 50
    queries() entries (r03 shipped 51 in the 'first 50' group and
    silently pushed one query out — ADVICE r3). Pin the arithmetic:
    every query awaiting its first driver check sits inside the
    window, and the canaries hold their documented positions."""
    names = list(entry.queries())
    window = names[:50]
    assert len(set(window)) == 50
    # canaries/probes at positions 13-15 (r7: canary_hugeint DEMOTED
    # past 50 after two consecutive confirming reds — the r5 decision)
    assert window[12] == "canary_hash_safe"
    assert window[13] == "canary_hash_risky"
    assert window[14] == "probe_corpus_echo"
    assert names.index("canary_hugeint") >= 50
    # the 31 round-6 rotation-queue queries (never driver-checked
    # r01-r06) all sit in the r7 window
    r6_queue = {
        "match_fellegi_sunter", "blocking_phonetic", "join_grid_radius",
        "io_table_diff", "dedup_containment", "profile_fds",
        "profile_inds", "normalize_fd_repair", "profile_keys",
        "io_scd2", "io_schema_union",
        "join_edit_distance", "profile_corr", "profile_dispersion",
        "embed_kmeans", "profile_quantiles", "normalize_impute",
        "profile_join_fanout", "normalize_clip", "normalize_rare_collapse",
        "events_paths", "events_resample", "profile_sequence_gaps",
        "events_anomalies", "io_compaction_plan",
        "sample_mixture_plan", "sample_epoch_expand",
        "normalize_canonicalize", "eval_ari", "eval_calibration",
        "profile_null_patterns",
    }
    assert r6_queue <= set(window), f"fell out: {r6_queue - set(window)}"
    # re-checks for code refactored in r6/r7 (events package migration)
    assert {"events_funnel", "events_retention", "events_sessionize_batch",
            "streaming_sessionize"} <= set(window)
    # round-7 new queries took free window slots directly
    assert {"join_edit_distance_capped",
            "fusion_custom_resolver"} <= set(window)
    past_window = set(names[50:])
    missing = ROTATION_QUEUE - past_window - set(window)
    assert not missing, f"rotation-queue query vanished: {missing}"


def test_every_query_has_driver_row_or_awaits_one():
    """VERDICT r5 #1: four contract queries silently never rotated into
    any driver window r01-r05. Guard the invariant structurally: every
    queries() name must either (a) have a recorded row in some
    CORRECTNESS_r*.json, (b) sit inside the current 50-entry window
    (awaiting its first check next round), or (c) be listed in the
    rotation queue pinned above."""
    import glob
    import json
    import os

    names = list(entry.queries())
    window = set(names[:50])
    rotation_queue = ROTATION_QUEUE
    repo = os.path.dirname(os.path.abspath(entry.__file__))
    checked = set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        checked |= set(json.load(open(path)))
    assert checked, "no CORRECTNESS_r*.json found"
    unaccounted = set(names) - checked - window - rotation_queue
    assert not unaccounted, (
        f"queries with no driver row, outside the window and the "
        f"rotation queue: {sorted(unaccounted)}"
    )


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
        # round-6 additions
        "dedup_bloom_incremental", "units_normalize",
        # round-6 session-3 additions
        "join_edit_distance", "profile_corr", "profile_dispersion",
        "embed_kmeans",
        "profile_quantiles", "normalize_impute", "profile_join_fanout",
        "normalize_clip", "normalize_rare_collapse", "events_paths",
        "events_resample", "profile_sequence_gaps", "events_anomalies",
        "io_compaction_plan", "sample_mixture_plan", "sample_epoch_expand",
        "normalize_canonicalize", "eval_ari", "eval_calibration",
        "profile_null_patterns",
        # round-7 additions
        "join_edit_distance_capped", "fusion_custom_resolver",
        "events_attribution", "profile_histogram", "events_active_users",
        "normalize_encode", "normalize_urls", "blocking_key_report",
        "streaming_distinct_users", "graph_triangles",
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
