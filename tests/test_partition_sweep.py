"""Mechanized partition-independence sweep (VERDICT r11 #6).

The cross-engine DuckDB oracle proves each query deterministic per
engine-config; per-family totality/independence parity tests pinned the
property for hand-picked operators and were extended by hand each round
(commits caa65fe, e9d8ef4). This replaces the hand-extension treadmill:
EVERY `queries()` entry replays at two shuffle-partition counts (4 vs
32 — the test session's `local[4]` keeps `defaultParallelism`, so the
sweep varies exactly the shuffle/groupBy/join/window partitioning) on
sf0.001 and must produce identical normalized output. Future queries
are covered by construction the moment they register.

Env knobs (runtime bounding, not correctness):
  PYDI_SWEEP_QUERIES=a,b,c  restrict to a comma-separated subset.
"""

import os
import sys

import __spark_entry__ as entry

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)
from check_oracle import normalize  # noqa: E402  (the driver-gate normalizer)

SWEEP_PARTITIONS = ("4", "32")


def test_every_query_partition_independent(spark, sf_dir):
    qs = entry.queries()
    only = set(
        q for q in os.environ.get("PYDI_SWEEP_QUERIES", "").split(",") if q
    )
    baseline = spark.conf.get("spark.sql.shuffle.partitions")
    failures = []
    try:
        for name, fn in qs.items():
            if only and name not in only:
                continue
            outs = []
            for parts in SWEEP_PARTITIONS:
                spark.conf.set("spark.sql.shuffle.partitions", parts)
                try:
                    df = fn(spark, sf_dir)
                    rows = [tuple(r) for r in df.collect()]
                    outs.append(normalize(rows, df.columns)[0])
                except Exception as e:  # noqa: BLE001 — collect, report all
                    failures.append(
                        f"{name}@{parts} parts: {type(e).__name__}: "
                        f"{str(e)[:200]}"
                    )
                    outs = None
                    break
            if outs is not None and outs[0] != outs[1]:
                diff = set(outs[0]) ^ set(outs[1])
                failures.append(
                    f"{name}: output differs between "
                    f"{SWEEP_PARTITIONS[0]} and {SWEEP_PARTITIONS[1]} "
                    f"shuffle partitions ({len(outs[0])} vs {len(outs[1])} "
                    f"rows; {len(diff)} rows differ, e.g. "
                    f"{sorted(diff)[:2]})"
                )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", baseline)
    assert not failures, (
        f"{len(failures)} partition-dependent queries:\n"
        + "\n".join(failures)
    )
