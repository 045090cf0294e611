from lakehouse_tools_spark.streaming.sink import upsert_stream
from lakehouse_tools_spark.streaming.windows import (
    sessionize,
    sliding_counts,
    tumbling_counts,
)

__all__ = ["sessionize", "sliding_counts", "tumbling_counts", "upsert_stream"]
