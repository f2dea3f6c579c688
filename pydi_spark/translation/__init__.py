from pydi_spark.translation.mapping_translator import MappingTranslator

__all__ = ["MappingTranslator"]
