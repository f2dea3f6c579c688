"""Feature extraction for ML matching: one column per comparator.

Reference: FeatureExtractor (PyDI/entitymatching/feature_extraction.py:
20-227) loops pairs and calls each comparator per row; here each
comparator is a Column and the whole feature matrix is one select over
the joined pair table. VectorFeatureExtractor (:230-593) emits embedding
distance features — expressed with array expressions over vector columns
(cosine / euclidean / manhattan) and optional pandas-UDF embedders.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pydi_spark.core.dataset import Dataset
from pydi_spark.functions.comparators import BaseComparator
from pydi_spark.matching.rule_based import join_pairs_to_records


@dataclass
class FeatureExtractor:
    comparators: list[BaseComparator] = field(default_factory=list)

    def feature_names(self) -> list[str]:
        return [f"feat_{c.column}_{i}" for i, c in enumerate(self.comparators)]

    def create_features(
        self,
        left: Dataset | DataFrame,
        right: Dataset | DataFrame,
        pairs: DataFrame,
        id_column: str | None = None,
        labels: DataFrame | None = None,
    ) -> DataFrame:
        """pairs -> DataFrame[id1, id2, feat_*, (label)]."""
        joined = join_pairs_to_records(pairs, left, right, id_column)
        cols = [F.col("p.id1").alias("id1"), F.col("p.id2").alias("id2")]
        for i, cmpr in enumerate(self.comparators):
            cols.append(
                F.coalesce(
                    cmpr.expr(F.col(f"l.{cmpr.column}"), F.col(f"r.{cmpr.column}")),
                    F.lit(0.0),
                ).alias(f"feat_{cmpr.column}_{i}")
            )
        feats = joined.select(*cols)
        if labels is not None:
            feats = feats.join(labels.select("id1", "id2", "label"), ["id1", "id2"], "left")
        return feats


@dataclass
class VectorFeatureExtractor:
    """Embedding-distance features per pair (reference:
    feature_extraction.py:230-593): embed the configured text columns on
    both sides with an injectable embedder (per-executor; deterministic
    fake by default), then emit cosine/euclidean/manhattan distance
    columns as native array expressions."""

    columns: list[str] = field(default_factory=list)
    embedder: object = None  # Callable[[list[str]], np.ndarray]
    distance_metrics: tuple = ("cosine", "euclidean", "manhattan")
    pooling: str = "concatenate"  # concatenate | mean of per-column texts

    def create_features(
        self,
        left: Dataset | DataFrame,
        right: Dataset | DataFrame,
        pairs: DataFrame,
        id_column: str | None = None,
    ) -> DataFrame:
        from pydi_spark.blocking.base import resolve_side
        from pydi_spark.blocking.embedding import EmbeddingBlocker, deterministic_embedder

        embedder = self.embedder or deterministic_embedder()
        text = F.concat_ws(" ", *[F.col(c).cast("string") for c in self.columns])

        def embed_side(data, out_vec):
            df, idc = resolve_side(data, id_column)
            blocker = EmbeddingBlocker(text_column="__text", embedder=embedder)
            vecs = blocker._with_vectors(df.withColumn("__text", text), idc)
            return vecs.select(
                F.col("rid"), F.col("vec").alias(out_vec)
            )

        lv = embed_side(left, "vec_l").withColumnRenamed("rid", "id1")
        rv = embed_side(right, "vec_r").withColumnRenamed("rid", "id2")
        joined = pairs.select("id1", "id2").join(lv, "id1").join(rv, "id2")
        return vector_distance_features(
            joined, "vec_l", "vec_r", self.distance_metrics
        ).drop("vec_l", "vec_r")


def vector_distance_features(
    df: DataFrame,
    left_vec: str,
    right_vec: str,
    metrics: tuple[str, ...] = ("cosine", "euclidean", "manhattan"),
) -> DataFrame:
    """Distance features between two array<float> columns as native
    expressions (reference: feature_extraction.py:230-593)."""
    a, b = F.col(left_vec), F.col(right_vec)
    zipped = F.zip_with(a, b, lambda x, y: x - y)
    prods = F.zip_with(a, b, lambda x, y: x * y)
    sumsq = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x
    )
    sumabs = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0.0).cast("double"), lambda acc, x: acc + F.abs(x)
    )
    total = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0.0).cast("double"), lambda acc, x: acc + x
    )
    out = df
    if "cosine" in metrics:
        out = out.withColumn(
            "dist_cosine",
            F.lit(1.0) - total(prods) / (F.sqrt(sumsq(a)) * F.sqrt(sumsq(b))),
        )
    if "euclidean" in metrics:
        out = out.withColumn("dist_euclidean", F.sqrt(sumsq(zipped)))
    if "manhattan" in metrics:
        out = out.withColumn("dist_manhattan", sumabs(zipped))
    return out
