"""Distributed global ranking.

``Window.orderBy`` with no partition key funnels the whole dataset
through ONE partition — the canonical Spark scale trap (plan_audit
flags it). The distributed equivalent: range-partition on the ordering,
per-partition row_number, then add broadcast cumulative partition
offsets — two narrow passes. Shared by sorted-neighbourhood blocking
and deterministic ID injection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list,
    out_col: str = "rn",
    num_partitions: int | None = None,
    return_count: bool = False,
) -> DataFrame:
    """Distributed global row_number: range-partition on the ordering,
    per-partition row_number, plus broadcast cumulative offsets.

    With ``return_count=True`` returns ``(df, total_rows)`` — the total
    falls out of the offset collect for free (no extra job)."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(parts, *order_cols).sortWithinPartitions(*order_cols)
    with_pid = ordered.withColumn("__pid", F.spark_partition_id())
    from pyspark.sql import Window

    w = Window.partitionBy("__pid").orderBy(*order_cols)
    # materialize the ranked frame before the counts action: the count
    # collect and the final join are two separate actions, and a
    # recomputed range partitioning (nondeterministic upstream, AQE
    # replan) could shift rows across partition boundaries between them,
    # corrupting the global ranks
    local = with_pid.withColumn("__local_rn", F.row_number().over(w)).localCheckpoint(
        eager=True
    )
    counts = (
        local.groupBy("__pid").count().orderBy("__pid").collect()
    )
    offsets = {}
    acc = 0
    for row in counts:
        offsets[row["__pid"]] = acc
        acc += row["count"]
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "__pid int, __off long"
        )
    )
    out = (
        local.join(off_df, "__pid")
        .withColumn(out_col, (F.col("__local_rn") + F.col("__off")).cast("long"))
        .drop("__pid", "__local_rn", "__off")
    )
    return (out, acc) if return_count else out
