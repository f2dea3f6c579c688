"""Instance-based schema matching: column-VALUE profile similarity.

Reference: InstanceBasedSchemaMatcher (PyDI/schemamatching/
instance_based.py:20-320): sample <= 1000 values per column (:70-89),
build term vectors (term_frequencies | binary_occurrence | tfidf,
:91-157), all-pairs vector similarity (cosine | jaccard | overlap),
threshold.

Spark shape: the per-column profiles come from ONE distributed pass per
table (sample -> explode tokens -> count); the similarity matrix over a
few hundred small vectors is driver-side math.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pydi_spark.core.dataset import Dataset, as_dataframe
from pydi_spark.schemamatching.base import build_mapping, dataset_name, schema_columns


def _column_term_counts(
    df: DataFrame, columns: list[str], sample_size: int
) -> dict[str, Counter]:
    """One distributed pass: stack sampled columns long, token counts."""
    total = df.count()
    if total > sample_size:
        df = df.sample(fraction=min(1.0, sample_size * 1.2 / total), seed=42).limit(
            sample_size
        )
    stacked = None
    for c in columns:
        part = df.select(
            F.lit(c).alias("col"),
            F.explode(
                F.split(F.lower(F.trim(F.col(c).cast("string"))), r"[^\p{L}\p{N}]+")
            ).alias("term"),
        ).where(F.col("term") != "")
        stacked = part if stacked is None else stacked.unionByName(part)
    counts = stacked.groupBy("col", "term").count().collect()
    out: dict[str, Counter] = {c: Counter() for c in columns}
    for r in counts:
        out[r["col"]][r["term"]] = r["count"]
    return out


def _vector(counts: Counter, method: str, idf: dict[str, float] | None) -> dict[str, float]:
    if method == "binary_occurrence":
        return {t: 1.0 for t in counts}
    if method == "term_frequencies":
        return dict(counts)
    if method == "tfidf":
        return {t: c * (idf or {}).get(t, 1.0) for t, c in counts.items()}
    raise ValueError(f"unknown vector_creation_method: {method}")


def _cosine(a: dict, b: dict) -> float:
    dot = sum(v * b.get(t, 0.0) for t, v in a.items())
    na = math.sqrt(sum(v * v for v in a.values()))
    nb = math.sqrt(sum(v * v for v in b.values()))
    return dot / (na * nb) if na and nb else 0.0


def _jaccard(a: dict, b: dict) -> float:
    sa, sb = set(a), set(b)
    return len(sa & sb) / len(sa | sb) if (sa or sb) else 0.0


def _overlap(a: dict, b: dict) -> float:
    sa, sb = set(a), set(b)
    m = min(len(sa), len(sb))
    return len(sa & sb) / m if m else 0.0


@dataclass
class InstanceBasedSchemaMatcher:
    vector_creation_method: str = "term_frequencies"
    similarity_function: str = "cosine"
    max_sample_size: int = 1000
    min_non_null_ratio: float = 0.1

    def match(
        self,
        source: Dataset | DataFrame,
        target: Dataset | DataFrame,
        threshold: float = 0.5,
    ) -> DataFrame:
        sdf, tdf = as_dataframe(source), as_dataframe(target)
        s_cols = [c for c, t in sdf.dtypes if c in schema_columns(source)]
        t_cols = [c for c, t in tdf.dtypes if c in schema_columns(target)]

        # completeness filter (reference min_non_null_ratio)
        def keep(df, cols):
            if not cols:
                return cols
            row = df.agg(
                F.count("*").alias("__n"),
                *[F.count(F.col(c)).alias(c) for c in cols],
            ).collect()[0]
            n = row["__n"] or 1
            return [c for c in cols if (row[c] or 0) / n >= self.min_non_null_ratio]

        s_cols, t_cols = keep(sdf, s_cols), keep(tdf, t_cols)
        s_counts = _column_term_counts(sdf, s_cols, self.max_sample_size)
        t_counts = _column_term_counts(tdf, t_cols, self.max_sample_size)

        idf = None
        if self.vector_creation_method == "tfidf":
            docs = list(s_counts.values()) + list(t_counts.values())
            n_docs = len(docs) or 1
            df_counts: Counter = Counter()
            for d in docs:
                df_counts.update(set(d))
            idf = {t: math.log((1 + n_docs) / (1 + c)) + 1 for t, c in df_counts.items()}

        sim = {"cosine": _cosine, "jaccard": _jaccard, "overlap": _overlap}[
            self.similarity_function
        ]
        s_name, t_name = dataset_name(source, "source"), dataset_name(target, "target")
        rows = []
        for sc in s_cols:
            va = _vector(s_counts[sc], self.vector_creation_method, idf)
            for tc in t_cols:
                vb = _vector(t_counts[tc], self.vector_creation_method, idf)
                rows.append(
                    (s_name, sc, t_name, tc, float(sim(va, vb)), "instance_based")
                )
        return build_mapping(sdf.sparkSession, rows, threshold)
