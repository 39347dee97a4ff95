from arc_kinesis_tagging_spark.sources.maintenance import (
    compact_parquet,
    write_partitioned,
    write_zordered,
    zorder_key,
)
from arc_kinesis_tagging_spark.sources.tables import TABLES, load_table, load_tables

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "compact_parquet",
    "write_partitioned",
    "write_zordered",
    "zorder_key",
]
