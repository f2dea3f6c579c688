"""Arrow-backed driver transfers for the deliberate driver-side stages.

The engine's few driver-side algorithms (hybrid connected components,
exact greedy 1:1 — both bounded by explicit size gates) move node- or
correspondence-sized tables driver-ward and back. Plain ``collect()`` /
``createDataFrame(list)`` serialize row-at-a-time through py4j pickling;
``toPandas()`` / ``createDataFrame(pandas)`` stream Arrow batches and are
10-50x faster on six-figure row counts. The conf is runtime-settable, so
these helpers force it on for the call and restore the session state —
the driver's unconfigured (vanilla) session gets the fast path too.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_ARROW_CONF = "spark.sql.execution.arrow.pyspark.enabled"


class _arrow_on:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        try:
            self.old = self.spark.conf.get(_ARROW_CONF)
        except Exception:
            self.old = None
        self.spark.conf.set(_ARROW_CONF, "true")

    def __exit__(self, *exc):
        if self.old is None:
            try:
                self.spark.conf.unset(_ARROW_CONF)
            except Exception:
                pass
        else:
            self.spark.conf.set(_ARROW_CONF, self.old)


def collect_pandas(df: DataFrame) -> pd.DataFrame:
    """Arrow-batched ``toPandas`` regardless of session configuration."""
    with _arrow_on(df.sparkSession):
        return df.toPandas()


def pandas_to_df(spark: SparkSession, pdf: pd.DataFrame, schema: str) -> DataFrame:
    """Arrow-batched ``createDataFrame`` with an explicit DDL schema."""
    if len(pdf) == 0:
        return spark.createDataFrame([], schema)
    with _arrow_on(spark):
        return spark.createDataFrame(pdf, schema)
