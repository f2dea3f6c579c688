from pydi_spark.clustering.centre import CentreClusterer
from pydi_spark.clustering.connected_components import (
    ConnectedComponentClusterer,
    connected_components,
)
from pydi_spark.clustering.greedy_one_to_one import GreedyOneToOneMatcher
from pydi_spark.clustering.hierarchical import HierarchicalClusterer
from pydi_spark.clustering.maximum_bipartite import MaximumBipartiteMatcher
from pydi_spark.clustering.stable_matching import StableMatcher

__all__ = [
    "CentreClusterer",
    "ConnectedComponentClusterer",
    "GreedyOneToOneMatcher",
    "HierarchicalClusterer",
    "MaximumBipartiteMatcher",
    "StableMatcher",
    "connected_components",
]
