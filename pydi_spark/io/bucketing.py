"""Bucketed storage: co-located joins for repeated entity matching.

At 100 TB the dominant cost of blocking is the shuffle of both record
tables on the block key. When the same tables are matched repeatedly
(nightly dedup runs, incremental matching), bucketing them ONCE on the
key removes that shuffle from every subsequent join: Spark's bucketed
scan exposes the hash partitioning to the planner and the equi-join
runs exchange-free (SortMergeJoin over pre-sorted buckets when sortBy
matches).

This is the Spark-native replacement for the reference's eager dict
indexes (blocking/standard.py:48-51) — a persistent index that lives in
the table layout instead of executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pydi_spark.core.dataset import Dataset, as_dataframe


def save_bucketed(
    data: Dataset | DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) table.

    ``num_buckets`` should put one bucket comfortably in executor memory
    at target scale (buckets = max join parallelism without AQE help).
    """
    df = as_dataframe(data)
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def is_exchange_free_join(joined: DataFrame) -> bool:
    """True when the physical plan contains no shuffle Exchange —
    the co-location check used by tests and plan audits."""
    spark = joined.sparkSession
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    return "Exchange hashpartitioning" not in plan


def rendezvous_shard(
    data: Dataset | DataFrame,
    key_col: str,
    weights: list[int],
    out_col: str = "shard",
) -> DataFrame:
    """Add ``out_col``: the WEIGHTED rendezvous (highest-random-weight)
    shard for each row's key. Shard ``i`` gets ``weights[i]`` virtual
    nodes; the row goes to the shard owning ``max md5(key:shard:rep)``
    over all virtual nodes (ties — md5 collisions — break to the
    larger shard id, deterministically).

    Why not ``hash % n`` (write_training_shards): rendezvous keeps
    assignment STABLE under topology change — removing a shard moves
    ONLY that shard's keys, and growing a shard's weight steals keys
    proportionally from everyone instead of reshuffling ~all keys the
    way modular hashing does. That is the property a 100 TB corpus
    wants when shard servers/capacities change between runs.

    Scale shape: a pure per-row expression — the argmax runs inside
    one array_max over sum(weights) md5 literals-per-row, whole-stage
    codegen, ZERO shuffles and no state. Integer replica weights give
    capacity ratios to ~1/sum(weights) precision; exact-arithmetic by
    construction (no float log/power rendezvous variants, which are
    not cross-engine portable).

    No reference counterpart — north-star addition.
    """
    from pyspark.sql import functions as F

    if not weights or any(int(w) < 1 for w in weights):
        raise ValueError(f"weights must be positive ints: {weights}")
    df = as_dataframe(data)
    key = F.col(key_col).cast("string")
    candidates = [
        F.struct(
            F.md5(
                F.concat(key, F.lit(f":{shard}:{rep}")).cast("binary")
            ).alias("h"),
            F.lit(shard).cast("int").alias("s"),
        )
        for shard, w in enumerate(weights)
        for rep in range(int(w))
    ]
    return df.withColumn(
        out_col, F.array_max(F.array(*candidates)).getField("s")
    )
