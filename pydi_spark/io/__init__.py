from pydi_spark.io.readers import (
    explode_delimited,
    list_to_string,
    load_csv,
    load_orc,
    load_excel,
    load_feather,
    load_fwf,
    load_html,
    load_pickle,
    load_json,
    load_parquet,
    load_table,
    load_xml,
)
from pydi_spark.io.compaction import (
    compaction_summary,
    list_data_files,
    plan_compaction,
)
from pydi_spark.io.bucketing import rendezvous_shard
from pydi_spark.io.cdc import apply_changes
from pydi_spark.io.cdc import point_in_time_join, scd2_history
from pydi_spark.io.diff import diff_summary, table_diff
from pydi_spark.io.schema_align import align_and_union
from pydi_spark.io.zorder import write_zordered, zorder_key, zorder_key_sql
from pydi_spark.io.writers import (
    write_csv,
    write_excel,
    write_html_page,
    write_json,
    write_orc,
    write_parquet,
    write_training_shards,
)

__all__ = [
    "explode_delimited",
    "list_to_string",
    "rendezvous_shard",
    "apply_changes",
    "compaction_summary",
    "list_data_files",
    "plan_compaction",
    "align_and_union",
    "diff_summary",
    "point_in_time_join",
    "scd2_history",
    "table_diff",
    "load_csv",
    "load_orc",
    "load_excel",
    "load_feather",
    "load_fwf",
    "load_html",
    "load_pickle",
    "load_json",
    "load_parquet",
    "load_table",
    "load_xml",
    "write_csv",
    "write_excel",
    "write_html_page",
    "write_json",
    "write_orc",
    "write_training_shards",
    "write_parquet",
    "write_zordered",
    "zorder_key",
    "zorder_key_sql",
]
