from pydi_spark.fusion.engine import DataFusionEngine, build_record_groups
from pydi_spark.fusion.resolvers import RESOLVERS, resolver
from pydi_spark.fusion.strategy import DataFusionStrategy

__all__ = [
    "RESOLVERS",
    "DataFusionEngine",
    "DataFusionStrategy",
    "build_record_groups",
    "resolver",
]
