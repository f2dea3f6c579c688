from pydi_spark.schemamatching.duplicate_based import DuplicateBasedSchemaMatcher
from pydi_spark.schemamatching.evaluation import SchemaMappingEvaluator
from pydi_spark.schemamatching.instance_based import InstanceBasedSchemaMatcher
from pydi_spark.schemamatching.label_based import LabelBasedSchemaMatcher
from pydi_spark.schemamatching.llm_based import LLMBasedSchemaMatcher

__all__ = [
    "DuplicateBasedSchemaMatcher",
    "InstanceBasedSchemaMatcher",
    "LLMBasedSchemaMatcher",
    "LabelBasedSchemaMatcher",
    "SchemaMappingEvaluator",
]
