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

# Round-11 queue: the full r10 queue (12 entries) rotated into the r11
# window (_R11_WINDOW in __spark_entry__.py) exactly as pre-pinned at
# r10 close. New r11 additions and material-change re-checks for
# queries OUTSIDE the r11 window queue here for the r12 window.
ROTATION_QUEUE: set[str] = {
    # r11 new queries: the fusion-analysis family's oracle rows
    # (VERDICT r10 #2 — analyze_attribute_coverage,
    # detect_attribute_conflicts via the multi-dataset union path, and
    # suggest_fusion_rules' dtype+conflict-rate branch)
    "fusion_coverage",
    "fusion_conflict_detect",
    "fusion_rule_suggest",
    # r11 new query: Misra-Gries heavy hitters pinned in its exact
    # regime (domain < k ==> sketch == exact counts, undercount 0,
    # deterministic under any partitioning — VERDICT r10 #6)
    "profile_heavy_hitters",
    # r11 material change: minhash family rewrite (md5-per-lane ->
    # Carter-Wegman over one shared per-token hash; VERDICT r10 #4) and
    # simhash integer band keys (VERDICT r10 #3). The in-window
    # consumers (dedup_minhash, dedup_incremental, dedup_lsh_recall,
    # dedup_agreement, dedup_simhash) re-check this round; the
    # out-of-window simhash consumers queue:
    "dedup_canonical",
    "eval_bcubed",
    "dedup_keep_best",
    "text_corpus_cleanup",
    # (r11 self-review) graph_pagerank also builds its edge set from
    # simhash_near_duplicates — the one simhash consumer the first
    # rotation pass missed; sample_split_leakage_safe, the other one,
    # sits in the r11 window already
    "graph_pagerank",
    # r11 material change: the hot-token cap now prunes via an anti-join
    # against the small HOT head instead of a pinned broadcast of the
    # vocabulary-sized keep list (the 100x fixed-output probe caught the
    # old shape collecting ~1 GiB to the driver). blocking_token itself
    # (cap off) is in-window; the capped variant queues:
    "blocking_token_capped",
    # r11 new query: proportional stratified sampling — one corpus
    # budget split across strata by exact largest-remainder (Hamilton)
    # apportionment, per-stratum picks by the md5 exact_k rule
    # (llmdata/sampling.py proportional_stratified_sample)
    "sample_proportional",
}
