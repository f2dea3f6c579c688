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
}
