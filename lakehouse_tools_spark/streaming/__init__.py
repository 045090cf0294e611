from lakehouse_tools_spark.streaming.sink import latest_per_key, upsert_stream
from lakehouse_tools_spark.streaming.windows import (
    sessionize,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "latest_per_key",
    "sessionize",
    "sliding_counts",
    "tumbling_counts",
    "upsert_stream",
]
