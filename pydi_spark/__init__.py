"""pydi_spark — a PySpark-native data-integration engine.

A from-scratch, Spark-first re-expression of the capabilities of the
wbsg-uni-mannheim/PyDI reference framework (pandas, single-process):
load -> profile -> normalize -> schema-match -> translate ->
entity-match (block + match + cluster) -> fuse -> evaluate,
plus large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) the reference lacks.

Every operator is a lazy DataFrame transformation; Catalyst is the
optimizer. See SURVEY.md for the reference parity map.
"""

from pydi_spark.core.dataset import Dataset
from pydi_spark.core.session import get_spark

__version__ = "0.1.0"

__all__ = ["Dataset", "get_spark", "__version__"]
