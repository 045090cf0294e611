from lakehouse_tools_spark.streaming.windows import (
    sessionize,
    sliding_counts,
    tumbling_counts,
)

__all__ = ["sessionize", "sliding_counts", "tumbling_counts"]
