from lakehouse_tools_spark.operators.profile import (
    PROFILE_DATA_SCHEMA,
    SCHEMA_INFORMATION_SCHEMA,
    profile_data,
    profile_table,
    schema_information,
)
from lakehouse_tools_spark.operators.merge import upsert
from lakehouse_tools_spark.operators.maintenance import compact, zorder_layout

__all__ = [
    "PROFILE_DATA_SCHEMA",
    "SCHEMA_INFORMATION_SCHEMA",
    "profile_data",
    "profile_table",
    "schema_information",
    "upsert",
    "compact",
    "zorder_layout",
]
