"""Physical-plan audit for every contract query.

Flags scale anti-patterns without running the queries:
- cartesian / broadcast nested-loop joins (quadratic without a key)
- single-partition exchanges (global sorts/windows that serialize)
- parquet scans with no column pruning (reading every column)
- row-at-a-time Python UDFs (BatchEvalPython) in the plan

Usage: python3 tools/plan_audit.py [sf_dir] [query ...]
Exit code 1 if any UNEXPECTED finding appears (known/intended ones are
allowlisted below with their justification).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# query -> patterns that are intended there (with reasons, for the reader)
ALLOWED = {
    "blocking_cross": {"cartesian", "nested_loop"},  # NoBlocker IS the cartesian op
    # k-doc sample all-pairs by design (k=100 -> 4,950 pairs) — the
    # empirical S-curve needs exhaustive ground truth on the sample
    "dedup_lsh_recall": {"cartesian", "nested_loop"},
    "ann_topk": {"nested_loop"},          # broadcast query-side brute force
    # TWO one-row total frames (sum n_a / sum n_b, derived from the
    # grouped counts) broadcast onto the value-level merge: O(#values)
    "profile_drift": {"nested_loop"},
    # same shape, numeric twin: TWO one-row totals broadcast onto the
    # n_bins-row merged grid: O(n_bins)
    "profile_numeric_drift": {"nested_loop"},
    # ONE-row basket-count total broadcast onto the item-pair table:
    # O(#pairs)
    "events_cooccurrence": {"nested_loop"},
    # TWO one-row broadcasts (control rate, contamination count) onto
    # the per-variant table: O(#variants)
    "events_experiment": {"nested_loop"},
    # ONE-row renormalization total broadcast per HITS half-round onto
    # the node frame: O(n) per round, 8 rounds
    "graph_hits": {"nested_loop"},
    # ONE-row non-null-count broadcast onto the distinct-value table:
    # O(#values)
    "normalize_rank": {"nested_loop"},
    "ann_ivf": {"nested_loop"},           # centroid assignment fan-out
    # k tiny broadcast centroids x corpus: the SemDeDup assignment
    # fan-out is O(n*k) by construction, like ann_ivf's
    "dedup_semantic": {"nested_loop"},
    "eval_blocking": {"cartesian"},       # metrics row built via driver counts
    # 11-row broadcast threshold table x scored gold pairs: O(11n), the
    # nested-loop side is the broadcast literal table
    "eval_threshold_sweep": {"nested_loop"},
    # ONE-row corpus-stats frame (N, avgdl, per-term df) broadcast onto
    # the per-doc frame: the keyless join is O(n) by construction
    "text_search_bm25": {"nested_loop"},
    # corpus_minhash_similarity pairs the per-SOURCE vocabulary
    # signatures all-vs-all: #groups^2 rows (groups = a handful of
    # sources), num_hashes ints per row — driver-small by construction
    "text_source_overlap": {"nested_loop"},
    # same bm25 scalar-stats broadcast inside the lexical channel; the
    # RRF fusion itself joins two top-50 lists (request-sized)
    "text_search_hybrid": {"nested_loop"},
    # bm25 scalar-stats broadcast inside the candidate stage; the
    # rerank itself touches only the top-50 candidates
    "text_rerank": {"nested_loop"},
    # ONE-row average-balance aggregate broadcast onto the filtered
    # customer side (the scalar-subquery plan Spark itself emits): O(n)
    "tpch_q22": {"nested_loop"},
    # ONE-row corpus totals (n_total, weight sum) broadcast onto the
    # per-source rate table: O(#sources)
    "text_temperature_mix": {"nested_loop"},
    # ONE-row (N, V) totals broadcast onto the doc-token frame: O(n)
    "text_lm_score": {"nested_loop"},
    # ONE-row (n, sum weight_ppm) totals broadcast onto the corpus: O(n)
    "sample_quality_weighted": {"nested_loop"},
    # ONE-row corpus-total broadcast onto the 200-row Zipf head: O(200)
    "text_zipf": {"nested_loop"},
    # ONE-row (T_tot, S_tot) totals broadcast onto per-doc masses: O(n)
    "sample_dsir": {"nested_loop"},
    # ONE-row revenue total broadcast onto the per-part frame (the
    # scalar-subquery HAVING plan Spark itself emits): O(#parts)
    "tpch_q11": {"nested_loop"},
    # n_cells broadcast coarse centroids x corpus: the IVF assignment
    # fan-out is O(n*k) by construction, like ann_ivf / dedup_semantic
    "embed_ivfpq_topk": {"nested_loop"},
    # ONE-row total-count aggregate broadcast onto the top-n key list:
    # O(top_n)
    "profile_key_skew": {"nested_loop"},
    # short-string fallback pair scan (strings too short for the q-gram
    # guarantee, len <= k*q+q-1): bounded by the short-string count and
    # EMPTY for name corpora — the gram path never nested-loops
    "join_edit_distance": {"nested_loop"},
    # same fallback; the gram cap does not touch the short-string path
    "join_edit_distance_capped": {"nested_loop"},
    # ONE-row non-null-total broadcast onto the category-count table
    # (share-threshold cross-multiply): O(cardinality)
    "normalize_rare_collapse": {"nested_loop"},
    # three ONE-row statistic frames (contingency totals, row marginal,
    # column marginal) cross-joined into the single ARI output row
    "eval_ari": {"nested_loop"},
    # ONE-row total broadcast onto the <= 2^k pattern-count table
    "profile_null_patterns": {"nested_loop"},
    # ONE-row corpus-span (min/max day) broadcast onto the user-day
    # grain table for the window clamp: O(user-days)
    "events_active_users": {"nested_loop"},
    # ONE-row node-count aggregate broadcast onto the ONE-row
    # sufficient-stats frame: O(1)
    "graph_assortativity": {"nested_loop"},
    # ONE-row grand-total broadcast onto the <= n_buckets bucket table:
    # O(n_buckets)
    "profile_lorenz": {"nested_loop"},
    # ONE-row weight-total broadcast onto the cumulative-weight line:
    # O(n), the PPS selection filter
    "sample_pps": {"nested_loop"},
    # ONE-row total-shed aggregate broadcast onto the <= top_n sketch
    # summary: O(top_n)
    "profile_heavy_hitters": {"nested_loop"},
}


def audit_plan(name: str, plan: str) -> list[str]:
    findings = []
    if "CartesianProduct" in plan and "cartesian" not in ALLOWED.get(name, set()):
        findings.append("CartesianProduct join")
    if (
        "BroadcastNestedLoopJoin" in plan
        and "nested_loop" not in ALLOWED.get(name, set())
    ):
        findings.append("BroadcastNestedLoopJoin")
    if "Exchange SinglePartition" in plan and "single_partition" not in ALLOWED.get(
        name, set()
    ):
        findings.append("single-partition exchange")
    if "BatchEvalPython" in plan:
        findings.append("row-at-a-time Python UDF")
    # scans reading >12 columns usually mean missing pruning on testdata
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        ncols = m.group(1).count(",") + 1 if m.group(1) else 0
        if ncols > 12:
            findings.append(f"wide scan ({ncols} columns)")
    return findings


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from pydi_spark import get_spark

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    bad = 0
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:120]}")
            bad += 1
            continue
        findings = audit_plan(name, plan)
        if findings:
            print(f"WARN {name}: " + "; ".join(findings))
            bad += 1
        else:
            print(f"ok   {name}")
    print(f"\n{bad} queries with findings")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
