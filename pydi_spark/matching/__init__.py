from pydi_spark.matching.active import uncertainty_band
from pydi_spark.matching.fellegi_sunter import (
    FellegiSunterMatcher,
    FSWeights,
    fs_weights_from_mu,
    train_fs_em,
)
from pydi_spark.matching.feature_extraction import (
    FeatureExtractor,
    VectorFeatureExtractor,
)
from pydi_spark.matching.ml_based import MLBasedMatcher
from pydi_spark.matching.model_based import (
    LLMBasedMatcher,
    PLMBasedMatcher,
    openai_compatible_client,
    sentence_transformer_cross_encoder,
)
from pydi_spark.matching.rule_based import RuleBasedMatcher
from pydi_spark.matching.text_formatting import TextFormatter

__all__ = [
    "uncertainty_band",
    "FeatureExtractor",
    "FellegiSunterMatcher",
    "FSWeights",
    "fs_weights_from_mu",
    "train_fs_em",
    "LLMBasedMatcher",
    "MLBasedMatcher",
    "PLMBasedMatcher",
    "RuleBasedMatcher",
    "openai_compatible_client",
    "sentence_transformer_cross_encoder",
    "TextFormatter",
    "VectorFeatureExtractor",
]
