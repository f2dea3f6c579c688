"""Dump .explain("formatted") for declared queries to a directory.

Usage: python3 tools/dump_plans.py <out_dir> [suffix] [query ...]

Writes <out_dir>/<query>_<suffix>.txt (suffix defaults to "before").
With no query list, dumps every bench.py BENCH_QUERIES entry. Plan
generation is driver-side analysis only — no job executes, so this is
safe to run alongside other work and at any scale factor.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from bench import BENCH_QUERIES
    from pydi_spark import get_spark

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    if not names:
        names = list(BENCH_QUERIES)

    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # plan-time failure is itself a finding
            plan = f"EXPLAIN FAILED: {exc}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"# {name}: {len(plan)} chars", file=sys.stderr)


if __name__ == "__main__":
    main()
