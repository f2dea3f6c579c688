"""Data-quality / observability demo: the pre-flight checks a pipeline
runs BEFORE a 100 TB job, and the repairs it applies after.

Profile -> diagnose (join fanout, key gaps, skew, correlations,
quantiles, anomalies) -> repair (impute, clip, collapse) — every step
an exact-arithmetic distributed operator, no sampling, no floats in
the decisions.

    python3 examples/data_quality.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pydi_spark import get_spark  # noqa: E402
from pydi_spark.events import resample_timeseries  # noqa: E402
from pydi_spark.normalization import (  # noqa: E402
    clip_outliers,
    collapse_rare_categories,
    impute_missing,
)
from pydi_spark.profiling import (  # noqa: E402
    categorical_dispersion,
    correlation_matrix,
    detect_anomalies,
    exact_quantiles,
    find_sequence_gaps,
    join_cardinality_report,
    key_skew_report,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("data-quality-demo")
    spark.sparkContext.setLogLevel("ERROR")

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    print("== join pre-flight: orders x lineitem on orderkey ==")
    join_cardinality_report(
        orders, lineitem, "o_orderkey", "l_orderkey"
    ).show(truncate=False)

    print("== key skew: which customers dominate orders ==")
    key_skew_report(orders, "o_custkey", top_n=5).show()

    print("== surrogate-key gaps (holes punched for the demo) ==")
    find_sequence_gaps(
        orders.where(F.col("o_orderkey") % 1000 != 7), "o_orderkey"
    ).show(5)

    print("== column statistics: quantiles / correlation / dispersion ==")
    exact_quantiles(
        lineitem, ["l_quantity", "l_extendedprice"], ps=(0.25, 0.5, 0.95)
    ).show()
    correlation_matrix(
        lineitem, ["l_quantity", "l_discount", "l_tax"], scale=2
    ).show()
    categorical_dispersion(
        orders, ["o_orderstatus", "o_orderpriority"]
    ).show()

    print("== event-rate anomalies (6h buckets, median +/- 2*MAD) ==")
    events = spark.read.option("timestampNTZ.enabled", "true").parquet(
        f"{sf_dir}/events.parquet"
    )
    series = resample_timeseries(
        events.select("event_type", F.col("ts").cast("timestamp").alias("ts")),
        key_col="event_type",
        interval_minutes=360,
    )
    flags = detect_anomalies(series, ["event_type"], "n_events", k_num=2)
    flags.where("is_anomaly = 1").orderBy("event_type", "bucket_start_us").show(5)

    print("== Benford first-digit profile: unit-mixing / fabrication smell ==")
    from pydi_spark.profiling import benford_profile

    cents = orders.select(
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents")
    )
    benford_profile(cents, ["cents"]).orderBy("digit").show(9)

    print("== categorical drift: early vs late orders ==")
    from pydi_spark.profiling import category_drift_report

    # split on the key's MEDIAN (orderkeys are sparse — max/2 or
    # count/2 would put ~1/8 of rows in the "early" half)
    mid = orders.agg(F.expr(
        "percentile_disc(0.5) WITHIN GROUP (ORDER BY o_orderkey)"
    )).collect()[0][0]
    a = orders.where(F.col("o_orderkey") <= mid).select("o_orderpriority")
    b = orders.where(F.col("o_orderkey") > mid).select("o_orderpriority")
    category_drift_report(a, b, "o_orderpriority").orderBy(
        F.abs(F.col("delta_ppm")).desc()
    ).show(5)

    print("== repairs: impute nulls, clip outliers, collapse rare keys ==")
    dirty = lineitem.select(
        "l_orderkey",
        "l_linestatus",
        F.when(F.col("l_orderkey") % 9 == 0, None)
        .otherwise(F.col("l_quantity"))
        .alias("qty"),
    )
    fixed = impute_missing(
        dirty, {"qty": "mean"}, group_by=["l_linestatus"], scale=2
    )
    print(
        "nulls:",
        dirty.where("qty IS NULL").count(),
        "->",
        fixed.where("qty IS NULL").count(),
    )
    clip_outliers(
        lineitem.select("l_extendedprice"), ["l_extendedprice"], 0.01, 0.99
    ).agg(
        F.min("l_extendedprice").alias("clipped_min"),
        F.max("l_extendedprice").alias("clipped_max"),
    ).show()
    collapse_rare_categories(
        orders.select("o_custkey"), "o_custkey", min_share_ppm=1000
    ).groupBy("o_custkey").count().orderBy(F.desc("count")).show(3)

    print("== k-anonymity: is (nation, segment) safe to release? ==")
    from pydi_spark.normalization import k_anonymity_report

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    kan = k_anonymity_report(
        customer, ["c_nationkey", "c_mktsegment"], k=10,
        sensitive_col="c_acctbal",
    )
    kan.where("meets_k = 0").orderBy("group_size").show(5)

    print("== key-collision value clustering (dirty segment labels) ==")
    from pydi_spark.normalization import value_cluster_report

    messy = customer.select(
        F.when(F.col("c_custkey") % 3 == 0,
               F.concat(F.lower("c_mktsegment"), F.lit(".")))
        .when(F.col("c_custkey") % 3 == 1, F.col("c_mktsegment"))
        .otherwise(F.concat(F.lit(" "), F.col("c_mktsegment"), F.lit(" ,")))
        .alias("segment")
    )
    value_cluster_report(messy, "segment").orderBy(
        "cluster_key", "value"
    ).show(6, truncate=False)

    print("== status runs per customer (stuck-value audit) ==")
    from pydi_spark.profiling import value_runs

    runs = value_runs(
        orders.select("o_custkey", "o_orderkey", "o_orderstatus"),
        ["o_custkey"], "o_orderkey", "o_orderstatus",
    )
    runs.orderBy(F.desc("run_len")).show(5)


if __name__ == "__main__":
    main()
