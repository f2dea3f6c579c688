"""Product-analytics demo over the events log: the round-7 analytics
surface end-to-end — sessions, funnels, paths, retention, rolling
active users, multi-touch attribution, resampled series with anomaly
flags, and windowed distinct users (the same call that runs as a
Structured Streaming query).

    python3 examples/product_analytics.py [sf_dir]

Every operator is exact integer/micros arithmetic (no floats in any
decision) and shuffles at most once by user/key — see SCALE.md.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pydi_spark import get_spark  # noqa: E402
from pydi_spark.events import (  # noqa: E402
    active_users,
    attribute_conversions,
    event_path_ngrams,
    funnel_stages,
    resample_timeseries,
    retention_cohorts,
    session_stats,
)
from pydi_spark.profiling import detect_anomalies  # noqa: E402
from pydi_spark.streaming import windowed_distinct_users  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("product_analytics")
    spark.sparkContext.setLogLevel("ERROR")
    from pydi_spark.io.readers import nanos_to_timestamp

    ev = nanos_to_timestamp(spark.read.parquet(f"{sf_dir}/events.parquet"))

    print("== sessions (30-min gap) ==")
    session_stats(ev).orderBy("user_id", "session_id").show(5)

    print("== session landing/exit report + bounce rate ==")
    from pydi_spark.events import session_entry_exit

    rep = session_entry_exit(ev)
    rep.orderBy("user_id", "session_id").show(5)
    rep.groupBy("entry_type").avg("is_bounce").orderBy("entry_type").show()

    print("== funnel view -> click -> purchase (24h steps) ==")
    funnel_stages(ev, ["view", "click", "purchase"]).orderBy("stage").show()

    print("== common 3-step paths ==")
    event_path_ngrams(ev, n=3).orderBy("cnt", ascending=False).show(
        5, truncate=False
    )

    print("== weekly retention cohorts ==")
    retention_cohorts(ev).orderBy("cohort_week", "wk_off").show(8)

    print("== revenue-weighted cohorts (LTV, exact micro sums) ==")
    from pydi_spark.events import cohort_value

    cohort_value(ev).orderBy("cohort_week", "wk_off").show(8)

    print("== rolling 7-day active users (exact) ==")
    active_users(ev, window_days=7).orderBy("day").show(7)

    print("== linear multi-touch attribution (24h lookback) ==")
    attribute_conversions(
        ev, ["click", "view"], "purchase", model="linear"
    ).show(8)

    print("== 6h event-rate series with robust anomaly flags ==")
    series = resample_timeseries(
        ev, key_col="event_type", interval_minutes=360
    )
    detect_anomalies(
        series.selectExpr(
            "event_type", "bucket_start_us AS t", "n_events AS v"
        ),
        ["event_type"], "v",
    ).where("is_anomaly = 1").show(5)

    print("== windowed distinct users (exact batch; HLL as a stream) ==")
    windowed_distinct_users(ev, "6 hours").orderBy("window_start").show(4)

    print("== RFM segmentation (global-rank quartiles) ==")
    from pydi_spark.events import rfm_segments

    rfm = rfm_segments(ev)
    rfm.orderBy("user_id").show(5)
    rfm.groupBy("segment").count().orderBy("segment").show()

    print("== event-type co-occurrence by (user, day) basket ==")
    from pyspark.sql import functions as F

    from pydi_spark.events import event_cooccurrence

    baskets = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        "event_type",
    )
    event_cooccurrence(baskets, ["user_id", "day"], "event_type").orderBy(
        F.desc("lift_micro")
    ).show(5)

    print("== when did each event type's rate shift? (changepoint) ==")
    from pydi_spark.profiling import changepoint_report

    changepoint_report(
        series, ["event_type"], "bucket_start_us", "n_events"
    ).orderBy(F.desc("stat_ppm")).show()


if __name__ == "__main__":
    main()
