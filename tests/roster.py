"""The pinned rotation-queue roster — the single source of truth.

Queries added while the driver's 50-entry correctness window is already
claimed by the current round's first-checks queue HERE and rotate into
the NEXT round's window. A query whose operator code materially changes
must also re-enter the window or this queue that round.

Pure data, importable by both tests/test_entry.py and
tools/check_oracle.py (ADVICE r8: the tool used to exec the test module
to read the queue, which ran test-file top-level code — this module has
no imports and no side effects, so loading it can never drag in pytest
fixtures or a SparkSession).
"""

# Round-12 queue: the full r11 queue (11 entries) rotated into the r12
# window (_R12_WINDOW in __spark_entry__.py) exactly as pre-pinned at
# r11 close. New r12 additions and material-change re-checks for
# queries OUTSIDE the r12 window queue here for the r13 window.
ROTATION_QUEUE: set[str] = {
    # r12 new query: 2-D Pareto frontier selection (llmdata/sampling.py
    # pareto_front over functions/ranks.py global_running_max — the
    # distributed exclusive prefix max); green under both gates at
    # birth, first driver row in the r13 window
    "sample_pareto_front",
    # r12 new query: corpus-level MinHash similarity between sources
    # (llmdata/dedup.py corpus_minhash_similarity — mergeable per-group
    # vocabulary signatures); green under both gates at birth
    "text_source_overlap",
    # --- r12 OPTIMIZATION-round material-change re-checks (operator
    # code changed; outputs verified identical under both local gates,
    # but the driver row is the signal of record). The simhash
    # fingerprint expressions moved to SQL strings + the hamming filter
    # moved before the pair-dedup exchange (llmdata/dedup.py) — the
    # five in-window consumers (dedup_canonical, eval_bcubed,
    # dedup_keep_best, text_corpus_cleanup, graph_pagerank) get their
    # r12 driver row on the new code already; these four consumers sit
    # outside the r12 window:
    "dedup_simhash",
    "dedup_agreement",
    "sample_split_leakage_safe",
    "sample_contrastive",
    # hits_micro dropped two redundant per-round joins (llmdata/graph.py)
    "graph_hits",
    # meta_blocking materializes the weighted graph before pruning
    # (blocking/meta.py) — all three consumers
    "blocking_meta",
    "blocking_meta_cnp",
    "blocking_progressive",
    # oriented-edge / canonical-edge materialization (llmdata/graph.py)
    "graph_triangles",
    "graph_clustering_coef",
    "graph_assortativity",
    # thresholded-correspondence materialization before the driver
    # solve (clustering/maximum_bipartite.py)
    "cluster_max_bipartite",
    # dead per-column distinct aggregates removed from discover_fds
    # (profiling/dependencies.py)
    "profile_fds",
    # --- r12 optimization batch 2 (outputs verified identical under
    # both local gates; in-window consumers blocking_phonetic,
    # blocking_stats, match_ml_linear, units_normalize, units_convert,
    # fusion_conflict_detect, fusion_rule_suggest get their r12 driver
    # row on the new code directly). StandardBlocker grew an opt-in
    # probe repartition (blocking/standard.py) — every out-of-window
    # blocker consumer re-checks:
    "blocking_standard",
    "blocking_standard_capped",
    "match_features",
    "match_fellegi_sunter",
    "match_llm_fake",
    "match_plm_fake",
    "movies_parity",
    "ann_ivf",
    # parse_quantity_expr modifier map-lookup (normalization/units.py)
    "extract_rules",
    # detect_attribute_conflicts min/max aggregate (fusion/analysis.py)
    "fusion_conflicts",
    # discover_inds single-job tagged union (profiling/dependencies.py)
    "profile_inds",
    # cross_source_overlap gram-frame materialization (llmdata/cleaning.py)
    "text_contamination_matrix",
    # --- r12 optimization batch 3 (outputs verified identical under
    # both local gates). connected_components' hybrid path now collects
    # the edge list directly when the edge frame is inside the driver
    # gate (the mapInPandas forest contraction was ~73% of hybrid CC
    # time and only shrinks what is collected) — every out-of-window
    # CC consumer re-checks; the in-window ones (dedup_canonical,
    # eval_bcubed, dedup_keep_best, text_corpus_cleanup, fusion_debug,
    # fusion_numeric, fusion_selection, fusion_coverage,
    # fusion_conflict_detect, fusion_rule_suggest) get their r12 driver
    # row on the new code directly:
    "cluster_connected_components",
    "cluster_consistency",
    "cluster_size_dist",
    "cluster_incremental",
    "fusion_lists",
    "fusion_custom_resolver",
    "fusion_accuracy",
    "fusion_trust",
    "fusion_most_complete",
    "dedup_incremental",
    "normalize_canonicalize",
    # detect_anomalies now derives the MAD median from the shared value
    # histogram; grouped_lower_median refactored onto the same core
    # (profiling/profiler.py)
    "events_anomalies",
    "normalize_impute",
    # funnel_stages materializes each per-user stage frame (events/ops.py)
    "events_funnel",
    # exact_span_stats folds its two per-doc count aggregates into one
    # via a repeated-flag left join (llmdata/spans.py)
    "text_span_dedup",
    # ngram jaccard/containment verify BEFORE the pair-dedup exchange
    # on the broadcast-verify path (llmdata/dedup.py)
    "dedup_ngram_jaccard",
    "dedup_ngram_prefix",
    "dedup_containment",
    # rfm_segments materializes per_user before the three chained
    # global ranks (events/ops.py)
    "events_rfm",
    # MIN-linkage-to-exhaustion now routes through connected
    # components instead of the collected sequential merge loop
    # (clustering/hierarchical.py) — output proven identical at three
    # SFs; MAX/AVG keep the sequential path (merge-order dependent),
    # so only the MIN query re-checks
    "cluster_hierarchical",
    # evaluate_blocking / evaluate_matching fold their 3- and 4-action
    # semi/anti-join counts into ONE tagged-union aggregate each
    # (evaluation/matching_eval.py) — outputs proven hash-identical at
    # three SFs; movies_parity (the third caller) is already queued
    "eval_blocking",
    "eval_matching",
    # edit_distance_join: positional q-gram prefix filtering on the
    # uncapped path + bounded-threshold levenshtein verify
    # (functions/joins.py) — outputs proven hash-identical at three
    # SFs; the capped path keeps the r6 set semantics its replay
    # oracle pins, but its gram-generation code moved, so it re-checks
    # too; normalize_canonicalize (third consumer) is already queued
    "join_edit_distance",
    "join_edit_distance_capped",
}
