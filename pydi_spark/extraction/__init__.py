from pydi_spark.extraction.code import CodeExtractor
from pydi_spark.extraction.evaluation import InformationExtractionEvaluator
from pydi_spark.extraction.llm import LLMExtractor
from pydi_spark.extraction.pipeline import ExtractorPipeline
from pydi_spark.extraction.regex import RegexExtractor
from pydi_spark.extraction.rules import BUILTIN_RULES, RuleDiscovery

__all__ = [
    "BUILTIN_RULES",
    "CodeExtractor",
    "ExtractorPipeline",
    "InformationExtractionEvaluator",
    "LLMExtractor",
    "RegexExtractor",
    "RuleDiscovery",
]
