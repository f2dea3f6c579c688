"""Extractor pipeline: chained lazy projections.

Reference: ExtractorPipeline (PyDI/informationextraction/base.py:215-268).
Chaining extractors composes withColumn projections — Catalyst collapses
them into one stage.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from pydi_spark.core.dataset import Dataset, as_dataframe


@dataclass
class ExtractorPipeline:
    extractors: list = field(default_factory=list)

    def run(self, data: Dataset | DataFrame, source_column: str | None = None) -> DataFrame:
        df = as_dataframe(data)
        for ex in self.extractors:
            df = ex.extract(df, source_column)
        return df
