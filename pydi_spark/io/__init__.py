from pydi_spark.io.readers import (
    explode_delimited,
    list_to_string,
    load_csv,
    load_orc,
    load_excel,
    load_feather,
    load_fwf,
    load_html,
    load_json,
    load_parquet,
    load_table,
    load_xml,
)
from pydi_spark.io.cdc import apply_changes
from pydi_spark.io.writers import (
    write_csv,
    write_json,
    write_orc,
    write_parquet,
    write_training_shards,
)

__all__ = [
    "explode_delimited",
    "list_to_string",
    "apply_changes",
    "load_csv",
    "load_orc",
    "load_excel",
    "load_feather",
    "load_fwf",
    "load_html",
    "load_json",
    "load_parquet",
    "load_table",
    "load_xml",
    "write_csv",
    "write_json",
    "write_orc",
    "write_training_shards",
    "write_parquet",
]
