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

from pyspark.sql import DataFrame, Window
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


def gap_fill(
    events: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Dense per-key time series: bucketed counts INCLUDING the empty
    buckets between each key's first and last event, zero-filled —
    the resampling step charting/anomaly pipelines need (a missing
    bucket and a zero bucket are different facts; ``tumbling_counts``
    alone can't distinguish them).

    Plan: one bucketed count (map-side combined), one per-key
    min/max-bucket aggregate (keys-sized), an explode of each key's
    bucket range (output-sized — the dense series IS the result), and
    a left join of the sparse counts onto the dense spine. The spine
    join keys are (key, bucket) — co-partitioned with the counts, no
    broadcast needed, and the spine is metadata-scale relative to the
    raw events whenever buckets aggregate many rows.
    """
    sec = F.lit(_duration_seconds(duration))
    b = F.floor(F.col(ts_col).cast("long") / sec).cast("long")
    counts = (
        events.select(F.col(key_col).alias("key"), b.alias("_b"))
        .groupBy("key", "_b")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    spans = counts.groupBy("key").agg(
        F.min("_b").alias("_lo"), F.max("_b").alias("_hi")
    )
    spine = spans.select(
        "key", F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("_b")
    )
    return (
        spine.join(counts, ["key", "_b"], "left")
        .select(
            "key",
            F.date_format(
                F.to_timestamp(F.col("_b") * sec), "yyyy-MM-dd HH:mm:ss"
            ).alias("window_start"),
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_events"),
        )
    )


def _duration_seconds(duration: str) -> int:
    """'5 minutes' / '1 hour' / '30 seconds' → seconds."""
    qty, unit = duration.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
    return int(qty) * mult


def forward_fill(
    df: DataFrame,
    order_col: str,
    key_col: str,
    cols: list[str],
) -> DataFrame:
    """Last-observation-carried-forward per key: nulls in ``cols``
    take the most recent non-null value in ``order_col`` order — the
    imputation step after resampling (``gap_fill``'s empty buckets
    carry no measurement; charts and models usually want the held
    value, not null).

    One window per call (single key exchange, one sort), all columns
    filled in the same pass with ``last(ignorenulls)``. Rows before a
    key's first observation stay null — forward fill has nothing to
    carry; compose with a backward pass if leading nulls must fill.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def interpolate_linear(
    df: DataFrame,
    order_col: str,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Linear interpolation of nulls per key: a missing value between
    two observations takes the straight-line value for its position —
    the imputation a rate-like series wants where LOCF would
    introduce steps. Endpoint nulls (before the first / after the
    last observation) stay null; compose with forward/backward fill
    when edges must fill too.

    Two windows over the same key exchange (preceding and following
    pass, both ``last/first(ignorenulls)``), carrying the neighbor
    VALUE and POSITION; the interpolated value is then a pure
    projection: ``prev + (next−prev)·(i−i_prev)/(i_next−i_prev)``.
    All position math is exact integer-derived doubles, so two
    engines produce identical IEEE results.
    """
    wp = (
        Window.partitionBy(key_col)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy(key_col)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    pos = F.when(v.isNotNull(), F.col(order_col).cast("double"))
    pv = F.last(v, ignorenulls=True).over(wp)
    pp = F.last(pos, ignorenulls=True).over(wp)
    nv = F.first(v, ignorenulls=True).over(wn)
    np_ = F.first(pos, ignorenulls=True).over(wn)
    i = F.col(order_col).cast("double")
    interp = pv + (nv - pv) * (i - pp) / (np_ - pp)
    return df.withColumn(
        value_col,
        F.when(v.isNotNull(), v).otherwise(
            F.when(pv.isNotNull() & nv.isNotNull(), interp)
        ),
    )


def ewma(
    df: DataFrame,
    order_col: str,
    key_col: str,
    value_col: str,
    alpha: float = 0.4,
    window: int = 8,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially weighted moving average per key, truncated to the
    trailing ``window`` rows — the smoothing step after resampling
    (``gap_fill``) that rolling means can't give: recent observations
    dominate, old ones decay geometrically.

    The textbook EWMA is a sequential recurrence
    ``y_t = α·x_t + (1−α)·y_{t−1}`` — inherently order-dependent and
    inexpressible as a parallel aggregate without a full prefix scan.
    This operator computes the TRUNCATED equivalent instead:

        y_t = Σ_{j<K} (1−α)^j · x_{t−j}  /  Σ_{j<K} (1−α)^j

    (sums over the lags that exist), which differs from the infinite
    recurrence by at most ``(1−α)^K`` of the signal range — for the
    defaults, 0.6^8 ≈ 1.7 %. In exchange the whole computation is K
    ``lag`` expressions over ONE window sort per key: a single key
    exchange, pure whole-stage-codegen projection, no sequential
    state, no applyInPandas. At 100 TB this is the same shuffle as any
    per-key window function; K only widens the projected expression.

    Determinism: the weights are Python-float literals and the
    numerator/denominator are built as an explicit left-to-right
    chained sum, so any engine evaluating the same expression order
    (see the paired DuckDB oracle) produces bit-identical doubles.

    Nulls in ``value_col`` and missing leading lags contribute nothing
    to either sum; a row whose trailing window is entirely null gets a
    null EWMA.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    w = Window.partitionBy(key_col).orderBy(F.col(order_col).asc())
    v = F.col(value_col).cast("double")
    num = None
    den = None
    for j in range(window):
        weight = (1.0 - alpha) ** j
        lagged = F.lag(v, j).over(w) if j else v
        term = F.when(lagged.isNotNull(), lagged * F.lit(weight)).otherwise(
            F.lit(0.0)
        )
        dterm = F.when(lagged.isNotNull(), F.lit(weight)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = dterm if den is None else den + dterm
    return df.withColumn(
        out_col, F.when(den > 0.0, num / den).otherwise(F.lit(None))
    )


def ewma_oracle_terms(
    value_sql: str, order_sql: str, key_sql: str, alpha: float, window: int
) -> tuple[str, str]:
    """(numerator, denominator) SQL fragments matching :func:`ewma`'s
    exact evaluation order, for building a DuckDB oracle: chained
    left-to-right sums over the same lag terms with the same Python
    ``repr`` float-literal weights."""
    over = f"OVER (PARTITION BY {key_sql} ORDER BY {order_sql})"
    nums, dens = [], []
    for j in range(window):
        weight = repr((1.0 - alpha) ** j)
        lagged = (
            f"CAST({value_sql} AS DOUBLE)"
            if j == 0
            else f"lag(CAST({value_sql} AS DOUBLE), {j}) {over}"
        )
        nums.append(
            f"(CASE WHEN {lagged} IS NOT NULL THEN {lagged} * {weight} "
            f"ELSE 0.0 END)"
        )
        dens.append(
            f"(CASE WHEN {lagged} IS NOT NULL THEN {weight} ELSE 0.0 END)"
        )
    return " + ".join(nums), " + ".join(dens)


def backward_fill(
    df: DataFrame,
    order_col: str,
    key_col: str,
    cols: list[str],
) -> DataFrame:
    """Next-observation-carried-backward per key — the mirror of
    :func:`forward_fill`, for filling the leading nulls a forward
    pass can't reach (compose both for a fully dense series). Same
    single-key-exchange window, scanning forward with
    ``first(ignorenulls)``."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.first(F.col(c), ignorenulls=True).over(w))
    return out
