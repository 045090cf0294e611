from lakehouse_tools_spark.streaming.sink import latest_per_key, upsert_stream
from lakehouse_tools_spark.streaming.tws import (
    rocksdb_state_store,
    stateful_sessionize_tws,
    tws_runtime_ready,
)
from lakehouse_tools_spark.streaming.windows import (
    sessionize,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "latest_per_key",
    "rocksdb_state_store",
    "sessionize",
    "sliding_counts",
    "stateful_sessionize_tws",
    "tumbling_counts",
    "tws_runtime_ready",
    "upsert_stream",
]
