"""Fusion analysis & reporting: conflict/coverage diagnostics as aggregates.

Reference: PyDI/fusion/analysis.py — analyze_attribute_coverage (:22-130),
compare_dataset_schemas (:133-187), detect_attribute_conflicts (:190-267),
analyze_conflicts_preview (:270-510); FusionReport + suggest_fusion_rules
(fusion/reporting.py:35-783). Everything reduces to groupBy/agg over the
pre-fusion grouped long table + driver-side rendering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pydi_spark.core.dataset import Dataset


def analyze_attribute_coverage(datasets: list[Dataset]) -> DataFrame:
    """[dataset, attribute, non_null, total, coverage]."""
    from pydi_spark.fusion.evaluation import coverage_metrics

    return coverage_metrics(datasets)


def compare_dataset_schemas(datasets: list[Dataset]) -> DataFrame:
    """[attribute, datasets_present, n_datasets, is_shared]."""
    spark = datasets[0].df.sparkSession
    rows = []
    all_attrs: dict[str, list[str]] = {}
    for ds in datasets:
        for c in ds.schema_columns():
            all_attrs.setdefault(c, []).append(ds.name)
    n = len(datasets)
    for attr, present in sorted(all_attrs.items()):
        rows.append((attr, sorted(present), n, len(present) == n))
    return spark.createDataFrame(
        rows,
        "attribute string, datasets_present array<string>, n_datasets int, is_shared boolean",
    )


def detect_attribute_conflicts(
    datasets: list[Dataset],
    correspondences: DataFrame,
    attributes: list[str] | None = None,
    id_column: str | None = None,
) -> DataFrame:
    """Per attribute: how many merged groups hold >1 distinct value
    (reference: analysis.py:190-267). One groupBy over the grouped union."""
    from pydi_spark.clustering.connected_components import connected_components
    from pydi_spark.fusion.engine import union_datasets

    union = union_datasets(datasets, id_column)
    comps = connected_components(correspondences.select("id1", "id2"))
    grouped = union.join(
        comps, union["__record_id"] == comps["record_id"], "inner"
    ).withColumn("group_id", F.col("cluster_id"))

    meta = {"__record_id", "__dataset", "__trust", "group_id", "record_id", "cluster_id"}
    attrs = attributes or [c for c in grouped.columns if c not in meta]
    aggs = []
    for a in attrs:
        distinct_vals = F.size(
            F.array_distinct(F.collect_list(F.col(a).cast("string")))
        )
        aggs.append(distinct_vals.alias(f"__d_{a}"))
    per_group = grouped.groupBy("group_id").agg(*aggs)
    out_aggs = [F.count("*").alias("n_groups")]
    for a in attrs:
        out_aggs.append(
            F.sum((F.col(f"__d_{a}") > 1).cast("int")).alias(f"__c_{a}")
        )
    row = per_group.agg(*out_aggs).collect()[0]
    spark = datasets[0].df.sparkSession
    n_groups = row["n_groups"]
    rows = [
        (a, int(row[f"__c_{a}"]), int(n_groups),
         row[f"__c_{a}"] / n_groups if n_groups else 0.0)
        for a in attrs
    ]
    return spark.createDataFrame(
        rows, "attribute string, conflicting_groups long, n_groups long, conflict_rate double"
    )


def suggest_fusion_rules(
    datasets: list[Dataset],
    correspondences: DataFrame,
    id_column: str | None = None,
) -> dict[str, str]:
    """Heuristic resolver suggestion per attribute (reference:
    reporting.py suggest_fusion_rules): numeric -> average, timestamp ->
    most_recent, array -> union, low-conflict strings -> first_non_null,
    high-conflict strings -> voting."""
    from pydi_spark.fusion.engine import union_datasets

    union = union_datasets(datasets, id_column)
    conflicts = {
        r["attribute"]: r["conflict_rate"]
        for r in detect_attribute_conflicts(
            datasets, correspondences, id_column=id_column
        ).collect()
    }
    out = {}
    for name, dtype in union.dtypes:
        if name.startswith("__"):
            continue
        if dtype in ("double", "float", "int", "bigint"):
            out[name] = "average"
        elif dtype.startswith("timestamp") or dtype == "date":
            out[name] = "most_recent"
        elif dtype.startswith("array"):
            out[name] = "union"
        elif conflicts.get(name, 0.0) > 0.3:
            out[name] = "voting"
        else:
            out[name] = "first_non_null"
    return out


class FusionReport:
    """Summary of a fusion run (reference: reporting.py:35-783)."""

    def __init__(self, fused: DataFrame):
        self.fused = fused

    def summary(self) -> dict:
        agg = self.fused.agg(
            F.count("*").alias("n_groups"),
            F.sum("_fusion_group_size").alias("n_records"),
            F.avg("_fusion_group_size").alias("avg_group_size"),
            F.max("_fusion_group_size").alias("max_group_size"),
            F.avg("_fusion_confidence").alias("avg_confidence"),
            F.sum((F.col("_fusion_group_size") > 1).cast("int")).alias("merged_groups"),
        ).collect()[0]
        return {k: agg[k] for k in agg.asDict()}

    def to_json(self, path: str) -> None:
        from pydi_spark.io.writers import write_artifact

        write_artifact(self.summary(), path)

    def to_html(self, path: str) -> None:
        s = self.summary()
        rows = "".join(f"<tr><td>{k}</td><td>{v}</td></tr>" for k, v in s.items())
        html = f"<html><body><h1>Fusion report</h1><table border=1>{rows}</table></body></html>"
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as fh:
            fh.write(html)
