"""Label-based schema matching: column-NAME similarity.

Reference: LabelBasedSchemaMatcher (PyDI/schemamatching/label_based.py:
17-140): all-pairs column-name similarity over ``[a-zA-Z]+`` tokens
(:63), keep >= threshold. N x M column names is tiny -> driver-side,
reusing the engine's pure-Python metric registry.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

from pydi_spark.core.dataset import Dataset
from pydi_spark.functions.metrics_py import REGISTRY
from pydi_spark.schemamatching.base import build_mapping, dataset_name, schema_columns


def _label_tokens(name: str) -> str:
    return " ".join(t.lower() for t in re.findall(r"[a-zA-Z]+", name))


@dataclass
class LabelBasedSchemaMatcher:
    similarity_function: str = "jaccard"
    tokenize: bool = True

    def match(
        self,
        source: Dataset | DataFrame,
        target: Dataset | DataFrame,
        threshold: float = 0.8,
    ) -> DataFrame:
        fn = REGISTRY[self.similarity_function]
        s_name = dataset_name(source, "source")
        t_name = dataset_name(target, "target")
        rows = []
        for sc in schema_columns(source):
            for tc in schema_columns(target):
                a = _label_tokens(sc) if self.tokenize else sc.lower()
                b = _label_tokens(tc) if self.tokenize else tc.lower()
                score = float(fn(a, b))
                rows.append((s_name, sc, t_name, tc, score, "label_based"))
        spark = (source.df if isinstance(source, Dataset) else source).sparkSession
        return build_mapping(spark, rows, threshold)
