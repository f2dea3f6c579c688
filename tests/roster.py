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

# Round-10 queue: the r9 queue (25 entries) fully rotated into the r10
# window (_R10_WINDOW in __spark_entry__.py); new r10 additions and
# material-change re-checks for queries OUTSIDE the r10 window queue
# here for the r11 window.
ROTATION_QUEUE: set[str] = {
    # r10 material change: the two scaffold dedups (VERDICT r9 #2).
    # global_row_number/global_running_sum now share the range-partition
    # + broadcast-offsets core (functions/ranks.py::_prefix_with_offsets);
    # the in-window consumers (events_rfm, events_new_users,
    # normalize_rank, profile_gini) re-check this round, the rest queue:
    "blocking_sorted_neighbourhood",
    "io_id_injection",
    "sample_contrastive",
    # range_join/interval_overlap_join now share the bucketize core
    # (functions/joins.py::_bucket_tools/_explode_to_buckets; range_join
    # auto-width is now the median of POSITIVE durations — the r9
    # interval-overlap fix applied to both). join_interval_overlap is
    # in-window; join_range queues:
    "join_range",
    # r10 new query: first oracle row for the multimodal family —
    # frozen dHash constants over the real PNG/JPEG codec paths
    # (VERDICT r9 #5)
    "multimodal_phash",
    # r10 new operators: Newman-Girvan modularity audit (exact integer
    # q_num/q_den + one final double division) and GNN-style numeric
    # feature smoothing (self-inclusive neighbour mean, 2 rounds)
    "graph_modularity",
    "graph_feature_prop",
    # r10 new operators: degree assortativity (sqrt-free symmetric
    # Pearson, exact integer num/den) and the Lorenz concentration
    # table (companion to profile_gini; tie-order-free bucket sums)
    "graph_assortativity",
    "profile_lorenz",
    # r10 new operator: automation detection via exact per-user median
    # inter-event gap (training-data hygiene gate for events-derived
    # corpora)
    "events_bots",
    # r10 new operator: deterministic systematic PPS sampling (exact
    # k hits on the cumulative-weight line, md5 walk order)
    "sample_pps",
    # r10 new operator: encoding-damage audit (mojibake / replacement /
    # control-char counts, pure codegen regex)
    "text_encoding",
}
