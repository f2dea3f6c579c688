"""Decompose a declared query's cost: construction (driver/py4j) vs
execution (count), warm best-of-N. Usage:

    python3 tools/profile_query.py <query> [<query> ...] [--runs N]

Reads $SPARK_GRAFT_SF_DIR (default sf0.1) like bench.py. Prints one line
per query: construct seconds, best/median count seconds.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entry
    from pydi_spark import get_spark

    spark = get_spark("profile", shuffle_partitions=int(os.environ["SPARK_GRAFT_CPUS"]))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    for name in args:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # cold pass to warm codegen/scan caches
        qs[name](spark, sf_dir).count()
        cons, execs = [], []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            n = df.count()
            t2 = time.perf_counter()
            cons.append(t1 - t0)
            execs.append(t2 - t1)
        print(
            f"{name}: construct best {min(cons):.2f}s "
            f"(med {statistics.median(cons):.2f}) | "
            f"count best {min(execs):.2f}s "
            f"(med {statistics.median(execs):.2f}) | rows {n}",
            flush=True,
        )


if __name__ == "__main__":
    main()
