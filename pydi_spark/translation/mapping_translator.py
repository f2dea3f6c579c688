"""Schema translation: apply a SchemaMapping by renaming columns.

Reference: MappingTranslator (PyDI/datatranslation/mapping_translator.py:
17-189): filter the mapping to ``source_dataset == dataset_name`` (:71),
pick the best-scoring target per source column (:77-118), rename (:138),
append provenance (:144-188).

The mapping table is column-count sized -> resolved on the driver; the
rename itself is a zero-cost ``select/alias`` projection in the plan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pydi_spark.core.dataset import Dataset


@dataclass
class MappingTranslator:
    strategy: str = "rename"

    def translate(
        self,
        data: Dataset | DataFrame,
        correspondences: DataFrame,
        dataset_name: str | None = None,
    ) -> Dataset | DataFrame:
        if isinstance(data, Dataset):
            name = dataset_name or data.name
            df = data.df
        else:
            if dataset_name is None:
                raise ValueError(
                    "translate on a bare DataFrame needs dataset_name "
                    "(reference reads df.attrs['dataset_name'], "
                    "mapping_translator.py:71)"
                )
            name = dataset_name
            df = data

        rows = (
            correspondences.where(F.col("source_dataset") == name)
            .select("source_column", "target_column", "score")
            .collect()
        )
        best: dict[str, tuple[str, float]] = {}
        for r in rows:
            s, t, sc = r["source_column"], r["target_column"], float(r["score"] or 0)
            if s not in best or sc > best[s][1] or (sc == best[s][1] and t < best[s][0]):
                best[s] = (t, sc)
        mapping = {s: t for s, (t, _) in best.items() if s in df.columns}
        out = df.withColumnsRenamed(mapping)

        if isinstance(data, Dataset):
            ds = data.with_df(out).with_provenance(
                "schema_translate", mapping=mapping, strategy=self.strategy
            )
            # per-column lineage under the TARGET name (reference
            # appends to each translated column's Series.attrs,
            # mapping_translator.py:144-188)
            for s, t in mapping.items():
                ds = ds.with_column_provenance(
                    t,
                    op="schema_translate",
                    translated_from=s,
                    source_dataset=name,
                    score=best[s][1],
                )
            return ds
        return out
