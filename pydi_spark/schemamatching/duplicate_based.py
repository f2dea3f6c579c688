"""Duplicate-based schema matching: vote on column pairs via known
record correspondences.

Reference: DuplicateBasedSchemaMatcher (PyDI/schemamatching/
duplicate_based.py:17-331): for each known record correspondence, every
(source_col, target_col) whose values match casts a vote (:129-227);
aggregate votes -> mapping.

Spark shape (SURVEY §2.6): melt both sides to long
[corr_id, column, value], join on corr_id, filter by the value-match
predicate, ``groupBy(source_column, target_column).count()`` — fully
distributed; only the final (tiny) vote table is collected.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pydi_spark.blocking.base import resolve_side
from pydi_spark.core.dataset import Dataset
from pydi_spark.schemamatching.base import build_mapping, dataset_name, schema_columns


def _melt(df: DataFrame, idc: str, cols: list[str], id_out: str) -> DataFrame:
    structs = F.array(
        *[
            F.struct(F.lit(c).alias("col"), F.col(c).cast("string").alias("value"))
            for c in cols
        ]
    )
    return df.select(
        F.col(idc).cast("string").alias(id_out), F.explode(structs).alias("kv")
    ).select(id_out, F.col("kv.col").alias("col"), F.col("kv.value").alias("value"))


@dataclass
class DuplicateBasedSchemaMatcher:
    value_comparison: str = "normalized"  # exact | normalized | fuzzy
    vote_aggregation: str = "majority"  # majority | weighted
    min_votes: int = 2
    ignore_zero_values: bool = True
    similarity_threshold: float = 0.8  # for fuzzy

    def _match_predicate(self, a: Column, b: Column) -> Column:
        if self.value_comparison == "exact":
            return a == b
        if self.value_comparison == "normalized":
            na = F.lower(F.trim(a))
            nb = F.lower(F.trim(b))
            return na == nb
        if self.value_comparison == "fuzzy":
            from pydi_spark.functions.similarity import similarity

            return similarity("jaccard", a, b) >= self.similarity_threshold
        raise ValueError(f"unknown value_comparison: {self.value_comparison}")

    def match(
        self,
        source: Dataset | DataFrame,
        target: Dataset | DataFrame,
        correspondences: DataFrame,
        id_column: str | None = None,
        threshold: float = 0.5,
    ) -> DataFrame:
        sdf, s_id = resolve_side(source, id_column)
        tdf, t_id = resolve_side(target, id_column)
        s_cols = schema_columns(source)
        t_cols = schema_columns(target)

        corr = correspondences.select(
            F.col("id1").cast("string").alias("id1"),
            F.col("id2").cast("string").alias("id2"),
            F.monotonically_increasing_id().alias("corr_id"),
        )
        # join both long sides per correspondence
        l = _melt(sdf, s_id, s_cols, "id1").join(corr.select("id1", "corr_id"), "id1").select(
            "corr_id", F.col("col").alias("source_column"), F.col("value").alias("v1")
        )
        r = _melt(tdf, t_id, t_cols, "id2").join(corr.select("id2", "corr_id"), "id2").select(
            "corr_id", F.col("col").alias("target_column"), F.col("value").alias("v2")
        )
        joined = l.join(r, "corr_id")
        if self.ignore_zero_values:
            nonzero = lambda v: v.isNotNull() & (F.trim(v) != "") & (v != "0")  # noqa: E731
            joined = joined.where(nonzero(F.col("v1")) & nonzero(F.col("v2")))
        votes = (
            joined.where(self._match_predicate(F.col("v1"), F.col("v2")))
            .groupBy("source_column", "target_column")
            .agg(F.countDistinct("corr_id").alias("votes"))
        )
        n_corr = corr.count()
        vote_rows = votes.collect()
        s_name, t_name = dataset_name(source, "source"), dataset_name(target, "target")
        rows = []
        for r_ in vote_rows:
            if r_["votes"] < self.min_votes:
                continue
            score = r_["votes"] / n_corr if n_corr else 0.0
            rows.append(
                (s_name, r_["source_column"], t_name, r_["target_column"],
                 float(score), f"duplicate_based votes={r_['votes']}")
            )
        return build_mapping(sdf.sparkSession, rows, threshold)
