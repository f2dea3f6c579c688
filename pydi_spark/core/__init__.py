from pydi_spark.core.dataset import Dataset
from pydi_spark.core.ids import add_id_column
from pydi_spark.core.session import get_spark

__all__ = ["Dataset", "add_id_column", "get_spark"]
