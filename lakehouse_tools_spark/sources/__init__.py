from lakehouse_tools_spark.sources.formats import (
    read_csv,
    read_json,
    roundtrip,
    write_csv,
    write_json,
)
from lakehouse_tools_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
    register_views,
)

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "read_csv",
    "read_json",
    "roundtrip",
    "write_csv",
    "write_json",
]
