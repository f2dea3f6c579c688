"""ML-based matching: features -> model inference over Arrow batches.

Reference: MLBasedMatcher (PyDI/entitymatching/ml_based.py:21-496):
feature extraction per pair -> sklearn predict/predict_proba[:,1] ->
threshold. Spark shape: the feature matrix is a DataFrame (one Column per
comparator, see feature_extraction.py); inference broadcasts the fitted
model and scores each Arrow batch in a pandas UDF — model deserialized
once per executor, vectorized predict per batch.

Training stays driver-side on a (sampled) collected feature table when a
sklearn-style estimator is passed — training data (labeled pairs) is
output-sized, not corpus-sized. For fully distributed training, pass
features to Spark MLlib directly; this class is the sklearn-parity path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from pydi_spark.core.dataset import Dataset
from pydi_spark.matching.feature_extraction import FeatureExtractor


@dataclass
class MLBasedMatcher:
    feature_extractor: FeatureExtractor
    model: Any = None  # fitted sklearn-style estimator

    def train(
        self,
        left: Dataset | DataFrame,
        right: Dataset | DataFrame,
        labeled_pairs: DataFrame,
        id_column: str | None = None,
        estimator: Any = None,
    ) -> "MLBasedMatcher":
        feats = self.feature_extractor.create_features(
            left, right, labeled_pairs, id_column, labels=labeled_pairs
        )
        pdf = feats.toPandas()
        fcols = [c for c in pdf.columns if c.startswith("feat_")]
        est = estimator or self.model
        if est is None:
            raise ValueError("pass an estimator to train()")
        est.fit(pdf[fcols].values, pdf["label"].astype(int).values)
        self.model = est
        return self

    def predict_pairs(
        self,
        left: Dataset | DataFrame,
        right: Dataset | DataFrame,
        candidates: DataFrame,
        id_column: str | None = None,
    ) -> DataFrame:
        """Score all candidates without thresholding
        (reference: ml_based.py:384-442)."""
        if self.model is None:
            raise ValueError("model not trained/supplied")
        feats = self.feature_extractor.create_features(
            left, right, candidates, id_column
        )
        fcols = [c for c in feats.columns if c.startswith("feat_")]
        spark = feats.sparkSession
        # cloudpickle serializes the model CLASS by value, so models
        # defined in notebooks/__main__ (or tests) survive the trip to
        # executors; deserialized once per python worker
        from pyspark import cloudpickle

        blob = cloudpickle.dumps(self.model)
        bc = spark.sparkContext.broadcast(blob)

        @F.pandas_udf(DoubleType())
        def score_udf(*cols: pd.Series) -> pd.Series:
            import pickle

            model = pickle.loads(bc.value)
            X = pd.concat(cols, axis=1).values
            if hasattr(model, "predict_proba"):
                return pd.Series(model.predict_proba(X)[:, 1])
            return pd.Series(model.predict(X).astype(float))

        # asNondeterministic: a threshold filter on the score column
        # (match()) otherwise gets pushed BELOW the projection and the
        # optimizer duplicates the ArrowEvalPython node — every row pays
        # model inference twice (optimization guide §4.4). Marking the
        # UDF non-deterministic forbids the duplication; scores are
        # unchanged (the model is a pure function of its inputs).
        score = score_udf.asNondeterministic()

        return feats.withColumn("score", score(*[F.col(c) for c in fcols])).select(
            "id1", "id2", "score", F.lit("ml_based").alias("notes")
        )

    def match(
        self,
        left: Dataset | DataFrame,
        right: Dataset | DataFrame,
        candidates: DataFrame,
        threshold: float = 0.5,
        id_column: str | None = None,
    ) -> DataFrame:
        scored = self.predict_pairs(left, right, candidates, id_column)
        return scored.where(F.col("score") >= F.lit(float(threshold)))
