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

# Round-9 queue: the r8 queue (19 entries) fully rotated into the r9
# window (_R9_WINDOW in __spark_entry__.py); new r9 additions queue
# here for their first driver checks in the r10 window.
ROTATION_QUEUE: set[str] = {
    # r9: first SQL oracles for hierarchical MAX/AVG linkage (the
    # forced-unique-merge-order triangle fixture — VERDICT r8 #4)
    "cluster_hierarchical_max",
    "cluster_hierarchical_avg",
    # r9 new operators: synchronous label-propagation communities,
    # weighted rendezvous-hash shard routing, positional phrase search
    "graph_label_prop",
    "io_rendezvous_shards",
    "text_search_phrase",
    # r9 new operator: personalized PageRank (seed-restart walk)
    "graph_ppr",
    # r9 new operator: equi-depth numeric drift report
    "profile_numeric_drift",
    # r9 new operator: structural link prediction (wedge enumeration,
    # integer RA/Jaccard scores)
    "graph_link_pred",
    # r9 new operator: bucketized interval x interval overlap join
    # (exactly-once emission guard, no post-join dedup)
    "join_interval_overlap",
    # r9 new operator: RFM segmentation (global-rank quartiles)
    "events_rfm",
    # r9 new operator: bounded-radius multi-source BFS
    "graph_bfs",
    # r9 new operators: k-anonymity/l-diversity audit and
    # key-collision value clustering
    "normalize_kanonymity",
    "normalize_value_clusters",
    # r9 new operators: market-basket co-occurrence, gaps-and-islands
    # value runs, exact mass-shift changepoint
    "events_cooccurrence",
    "profile_value_runs",
    "profile_changepoint",
    # r9 new operator: A/B experiment readout with assignment hygiene
    "events_experiment",
    # r9 new operator: HITS hubs/authorities (directed bipartite)
    "graph_hits",
    # r9 new operator: edge-weighted PageRank (weight-proportional
    # floor shares on the shared core — the core change also keeps
    # graph_pagerank / graph_ppr queued above)
    "graph_pagerank_weighted",
    # r9 new operators: percent-rank normalization (distributed
    # running-sum core) and grouped top-k
    "normalize_rank",
    "profile_topk_per_group",
    # r9 new query: ORC write/load roundtrip under the oracle gate
    "io_orc_roundtrip",
    # r9 new operators: exact Gini concentration, new-users growth
    # curve (both on the distributed rank/running-sum cores)
    "profile_gini",
    "events_new_users",
    # r9 material change: pagerank_micro refactored onto the shared
    # _pagerank_core (same integer formula; re-check next window)
    "graph_pagerank",
}
