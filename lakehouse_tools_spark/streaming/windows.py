"""Event-time windowed aggregation — batch and Structured Streaming.

The reference has no streaming surface (SURVEY.md §2.9); this module
adds the standard event-time operators over the ``events`` fixture
shape ``(event_id, ts, user_id, event_type, value, props)``. Every
builder takes a DataFrame that may be a static relation *or* a
``readStream`` relation: ``F.window`` / ``F.session_window`` plans
identically in both, and streaming callers add a watermark first
(:func:`with_watermark`) to bound state for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Bound streaming state: events later than ``delay`` behind the
    max observed event time are dropped/finalized."""
    return df.withWatermark(ts_col, delay)


def tumbling_counts(
    events: DataFrame,
    duration: str = "5 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Non-overlapping event-time windows: count + mean value per
    (window, key). Output window start/end as formatted strings so
    results are engine-portable.
    """
    w = F.window(F.col(ts_col), duration)
    return (
        events.groupBy(w.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    duration: str = "10 minutes",
    slide: str = "5 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Overlapping windows (each event lands in duration/slide
    windows). Same output contract as :func:`tumbling_counts`."""
    w = F.window(F.col(ts_col), duration, slide)
    return (
        events.groupBy(w.alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            key_col,
            "n_events",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "5 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows: consecutive events of one key belong to the
    same session while the gap between them is < ``gap``.

    Uses the native ``F.session_window`` (stateful, watermark-aware
    in streaming). Session start is the first event's time; output
    ``(user_id, session_start, n_events, sum_value)``. Semantics are
    SQL-reproducible as gaps-and-islands (lag + cumulative sum), which
    the oracle uses.
    """
    w = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(w.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            key_col,
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
