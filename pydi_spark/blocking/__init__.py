from pydi_spark.blocking.base import (
    block_stats,
    blocking_key_report,
    estimate_pairs,
)
from pydi_spark.blocking.embedding import (
    EmbeddingBlocker,
    sentence_transformer_embedder,
)
from pydi_spark.blocking.meta import meta_blocking, progressive_pairs
from pydi_spark.blocking.no_blocking import NoBlocker
from pydi_spark.blocking.sorted_neighbourhood import SortedNeighbourhoodBlocker
from pydi_spark.blocking.standard import StandardBlocker
from pydi_spark.blocking.token import TokenBlocker

__all__ = [
    "EmbeddingBlocker",
    "NoBlocker",
    "SortedNeighbourhoodBlocker",
    "StandardBlocker",
    "TokenBlocker",
    "block_stats",
    "blocking_key_report",
    "estimate_pairs",
    "meta_blocking",
    "progressive_pairs",
    "sentence_transformer_embedder",
]
