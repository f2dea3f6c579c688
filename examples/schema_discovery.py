"""Schema discovery + repair + snapshot maintenance demo.

Profile-first integration: discover keys, functional and inclusion
dependencies on raw sources, repair an FD the business asserts, then
maintain the integrated table with snapshot diffs and an SCD2 history.

    python3 examples/schema_discovery.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pydi_spark import get_spark  # noqa: E402
from pydi_spark.io import (  # noqa: E402
    align_and_union,
    diff_summary,
    load_parquet,
    scd2_history,
    table_diff,
)
from pydi_spark.normalization import repair_fd_violations  # noqa: E402
from pydi_spark.profiling import (  # noqa: E402
    discover_fds,
    discover_inds,
    discover_keys,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("schema-discovery-demo")
    spark.sparkContext.setLogLevel("ERROR")

    orders = load_parquet(spark, f"{sf_dir}/orders.parquet", "orders").df
    cust = load_parquet(spark, f"{sf_dir}/customer.parquet", "customer").df

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    print("== candidate keys ==")
    discover_keys(orders, cols, max_size=2).where("is_key = 1").show()

    print("== functional dependencies ==")
    discover_fds(orders, cols).where("holds = 1").show()

    print("== inclusion dependencies (FK candidates) ==")
    discover_inds(
        [(orders, "o_custkey", cust, "c_custkey")],
        names=[("orders.o_custkey", "customer.c_custkey")],
    ).show(truncate=False)

    print("== repair an asserted FD (majority vote) ==")
    repaired = repair_fd_violations(orders, "o_custkey", "o_orderpriority")
    repaired.agg(F.sum("__repaired").alias("rows_changed")).show()

    print("== snapshot diff after the repair ==")
    diff = table_diff(
        orders.select("o_orderkey", "o_orderpriority"),
        repaired.select("o_orderkey", "o_orderpriority"),
        "o_orderkey",
    )
    diff_summary(diff).show()

    print("== schema-aligned union of drifted sources ==")
    a = orders.select(F.col("o_orderkey").alias("rid"), "o_orderstatus")
    b = cust.select(F.col("c_custkey").alias("rid"), "c_mktsegment")
    align_and_union([a, b], source_col="src",
                    source_names=["orders", "customer"]).show(4)

    print("== SCD2 history of per-customer status changes ==")
    changes = orders.select(
        "o_custkey", "o_orderstatus",
        F.col("o_orderkey").alias("version"),
        F.lit("U").alias("op"),
    )
    scd2_history(changes, "o_custkey").where("is_current = 1").show(4)


if __name__ == "__main__":
    main()
