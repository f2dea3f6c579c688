"""Data fusion engine: union -> connected components -> ONE groupBy.

Reference: DataFusionEngine.run (PyDI/fusion/engine.py:248-508):
normalize ids (:395-438), build record groups via recursive-DFS connected
components (:62-185), per-group per-attribute Python fusers (:510-667),
output with ``_id = "fused_{group_id}"``, ``_fusion_group_id``,
``_fusion_sources``, ``_fusion_confidence`` (:657-665).

Spark shape (SURVEY §2.8): tag each dataset with (dataset, trust), union
by name, join the distributed connected-components assignment, then one
``groupBy(group_id)`` whose aggregate list is composed from the
strategy's compiled resolvers — map-side partial aggregation, no
per-group Python unless a custom callable resolver is registered
(those run via a pandas UDF over the group's collected values).

Scale notes: the union is column-pruned by Catalyst to exactly the
attributes being fused; CC is the iterative join-loop (no recursion);
singletons come from the left join's null side (no anti-join pass).
"""

from __future__ import annotations

import json
from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    StringType,
    StructField,
    StructType,
)

from pydi_spark.clustering.connected_components import connected_components
from pydi_spark.core.dataset import Dataset
from pydi_spark.fusion.resolvers import RESOLVERS, ResolverAggs
from pydi_spark.fusion.strategy import DataFusionStrategy


def _validity_nulled(col: Column, dtype) -> Column:
    """Reference validity gate (_is_valid_value, fusion/base.py:20-55):
    NaN and empty lists are invalid — nulled here so every resolver's
    null-skipping aggregate ignores them. Empty strings stay valid
    (pd.isna('') is False in the reference)."""
    if isinstance(dtype, (DoubleType, FloatType)):
        return F.when(~F.isnan(col), col)
    if isinstance(dtype, ArrayType):
        return F.when(F.size(col) > 0, col)
    return col


def build_record_groups(
    datasets: list[Dataset],
    correspondences: DataFrame,
    id_column: str | None = None,
) -> DataFrame:
    """[record_id, dataset, group_id]; unmatched records form singleton
    groups (reference: engine.py:166-172). group_id = min record id of the
    component (deterministic)."""
    union = union_datasets(datasets, id_column)
    comps = connected_components(correspondences.select("id1", "id2"))
    return (
        union.select("__record_id", "__dataset")
        .join(comps, union["__record_id"] == comps["record_id"], "left")
        .select(
            "__record_id",
            "__dataset",
            F.coalesce(F.col("cluster_id"), F.col("__record_id")).alias("group_id"),
        )
    )


def union_datasets(datasets: list[Dataset], id_column: str | None = None) -> DataFrame:
    """Tag + align + union all sources (missing columns -> null)."""
    tagged = []
    for ds in datasets:
        if not isinstance(ds, Dataset):
            raise ValueError(
                "fusion requires Dataset wrappers (dataset_name is semantically "
                "required — reference: fusion/engine.py:398-401)"
            )
        idc = id_column or ds.id_column
        if idc is None:
            raise ValueError(f"dataset {ds.name}: no id column")
        df = ds.df.withColumn("__record_id", F.col(idc).cast("string"))
        df = df.withColumn("__dataset", F.lit(ds.name))
        df = df.withColumn(
            "__trust", F.lit(ds.trust_score).cast("double")
        )
        tagged.append(df.drop(idc))
    out = tagged[0]
    for df in tagged[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


class DataFusionEngine:
    def __init__(
        self,
        strategy: DataFusionStrategy | None = None,
        include_singletons: bool = True,
        default_resolver: str = "first_non_null",
    ):
        self.strategy = strategy or DataFusionStrategy()
        self.include_singletons = include_singletons
        self.default_resolver = default_resolver

    def run(
        self,
        datasets: list[Dataset],
        correspondences: DataFrame,
        schema_correspondences: DataFrame | None = None,
        id_column: str | None = None,
        attributes: list[str] | None = None,
        debug: bool = False,
    ) -> DataFrame:
        """``debug=True`` keeps per-attribute confidence columns
        (``_conf_{attr}``) for the per-group per-attribute trace
        (reference debug log, engine.py:257-354); pair with
        ``fusion_debug_long`` + ``write_json`` for the JSONL artifact."""
        if schema_correspondences is not None:
            from pydi_spark.translation.mapping_translator import MappingTranslator

            translator = MappingTranslator()
            datasets = [
                translator.translate(ds, schema_correspondences) for ds in datasets
            ]
        union = union_datasets(datasets, id_column)
        comps = connected_components(correspondences.select("id1", "id2"))
        with_groups = union.join(
            comps, union["__record_id"] == comps["record_id"], "left"
        ).withColumn(
            "group_id", F.coalesce(F.col("cluster_id"), F.col("__record_id"))
        ).drop("record_id", "cluster_id")
        if not self.include_singletons:
            sizes = with_groups.groupBy("group_id").agg(F.count("*").alias("__n"))
            with_groups = (
                with_groups.join(sizes, "group_id").where("__n > 1").drop("__n")
            )

        meta_cols = {"__record_id", "__dataset", "__trust", "group_id"}
        attrs = attributes or [c for c in with_groups.columns if c not in meta_cols]

        rid, dsc, trust = F.col("__record_id"), F.col("__dataset"), F.col("__trust")
        agg_exprs: list[Column] = [
            F.sort_array(F.collect_set(dsc)).alias("_fusion_sources"),
            F.count("*").alias("_fusion_group_size"),
        ]
        conf_cols: list[str] = []
        rules: dict[str, str] = {}
        custom: list[tuple[str, Callable]] = []
        schema_by_name = {f.name: f.dataType for f in with_groups.schema.fields}
        for attr in attrs:
            fuser = self.strategy.fusers.get(attr)
            v = _validity_nulled(F.col(attr), schema_by_name[attr])
            if fuser is not None and fuser.py_resolver is not None:
                # custom callable tier: collect the group's values + context
                agg_exprs.append(
                    F.collect_list(
                        F.struct(
                            v.cast("string").alias("value"),
                            rid.alias("record_id"),
                            dsc.alias("dataset"),
                            trust.alias("trust"),
                        )
                    ).alias(f"__raw_{attr}")
                )
                custom.append((attr, fuser.py_resolver))
                rules[attr] = getattr(fuser.py_resolver, "__name__", "custom")
                continue
            if fuser is not None:
                aggs: ResolverAggs = fuser.builder(v, rid, dsc, trust)
            else:
                aggs = RESOLVERS[self.default_resolver](v, rid, dsc, trust)
            # temp alias: reusing the input name would shadow it for later
            # aggregates (lateral column alias)
            agg_exprs.append(aggs.value.alias(f"__fused_{attr}"))
            agg_exprs.append(aggs.confidence.alias(f"__conf_{attr}"))
            conf_cols.append(f"__conf_{attr}")
            rules[attr] = aggs.rule

        fused = with_groups.groupBy("group_id").agg(*agg_exprs)

        # custom-callable resolvers: pandas UDF over the collected group
        for attr, fn in custom:
            out_schema = StructType(
                [StructField("value", StringType()), StructField("confidence", DoubleType())]
            )

            def make_udf(_fn):
                @F.pandas_udf(out_schema)
                def apply_resolver(raw: pd.Series) -> pd.DataFrame:
                    vals, confs = [], []
                    for group in raw:
                        values = [g["value"] for g in group if g["value"] is not None]
                        sources = [g["record_id"] for g in group]
                        trust_map = {g["dataset"]: g["trust"] for g in group}
                        try:
                            res = _fn(values, sources=sources, trust_map=trust_map)
                            if isinstance(res, tuple):
                                value, conf = res[0], res[1] if len(res) > 1 else 0.5
                            else:
                                value, conf = res, 0.5
                        except Exception:
                            # reference fallback: first value, confidence 0.1
                            # (fusion/base.py:323-331)
                            value = values[0] if values else None
                            conf = 0.1
                        vals.append(None if value is None else str(value))
                        confs.append(float(conf))
                    return pd.DataFrame({"value": vals, "confidence": confs})

                return apply_resolver

            apply_resolver = make_udf(fn)

            fused = fused.withColumn(f"__res_{attr}", apply_resolver(F.col(f"__raw_{attr}")))
            fused = (
                fused.withColumn(f"__fused_{attr}", F.col(f"__res_{attr}.value"))
                .withColumn(f"__conf_{attr}", F.col(f"__res_{attr}.confidence"))
                .drop(f"__raw_{attr}", f"__res_{attr}")
            )
            conf_cols.append(f"__conf_{attr}")

        conf_exprs = [F.col(c) for c in conf_cols]
        mean_conf = (
            sum(
                (F.coalesce(c, F.lit(0.0)) for c in conf_exprs),
                start=F.lit(0.0),
            )
            / F.lit(max(len(conf_exprs), 1))
        ).alias("_fusion_confidence")

        debug_cols = (
            [F.col(f"__conf_{a}").alias(f"_conf_{a}") for a in attrs if f"__conf_{a}" in conf_cols]
            if debug
            else []
        )
        result = fused.select(
            F.concat(F.lit("fused_"), F.col("group_id")).alias("_id"),
            F.col("group_id").alias("_fusion_group_id"),
            *[F.col(f"__fused_{a}").alias(a) for a in attrs],
            F.col("_fusion_sources"),
            F.col("_fusion_group_size"),
            mean_conf,
            F.lit(json.dumps({"rules": rules})).alias("_fusion_metadata"),
            *debug_cols,
        )
        return result


def fusion_debug_long(fused: DataFrame) -> DataFrame:
    """Melt a debug-mode fused frame to the reference's per-group
    per-attribute trace shape [group_id, attribute, value, confidence,
    rule] (engine.py:257-354); write with io.writers.write_json for the
    JSONL artifact."""
    conf_attrs = [c[len("_conf_"):] for c in fused.columns if c.startswith("_conf_")]
    if not conf_attrs:
        raise ValueError("run the engine with debug=True first")
    rules_map = F.from_json(
        F.col("_fusion_metadata"), "struct<rules: map<string,string>>"
    )["rules"]
    entries = F.array(
        *[
            F.struct(
                F.lit(a).alias("attribute"),
                F.col(a).cast("string").alias("value"),
                F.col(f"_conf_{a}").alias("confidence"),
                rules_map[a].alias("rule"),
            )
            for a in conf_attrs
        ]
    )
    return fused.select(
        F.col("_fusion_group_id").alias("group_id"), F.explode(entries).alias("e")
    ).select("group_id", "e.attribute", "e.value", "e.confidence", "e.rule")
