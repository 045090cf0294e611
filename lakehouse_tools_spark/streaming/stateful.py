"""Custom stateful streaming operator: explicit-state sessionization
via ``applyInPandasWithState``.

``streaming.windows.sessionize`` uses the native ``session_window``;
this module is the escape hatch for session semantics the built-in
can't express (per-key dynamic gaps, session-level derived features,
caps on session length) — the pattern every custom stateful operator
follows: group → Arrow batches + a typed ``GroupState`` → emit rows,
with an event-time timeout bounding state under the watermark.

Semantics are EXACTLY ``session_window`` + watermark + append mode:
state per key is the set of session intervals the watermark has not
yet sealed (an interval is sealed — emitted and dropped — once
``watermark ≥ last_event + gap``, the point after which no admissible
event can extend or merge it). Keeping the interval SET, not just the
newest interval, is what makes sub-watermark stragglers correct: late
events that fall between sealed points merge with EACH OTHER and with
either neighbor interval exactly as the batch operator would, instead
of being emitted as premature singletons. State is 32 bytes per live
interval; the set holds the open session plus any intervals still
inside the watermark horizon — bounded by the configured lateness
(``delayThreshold / gap`` intervals at worst), independent of event
volume.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.StringType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)

#: One struct field per live interval component, parallel arrays —
#: the state-store encoder round-trips flat arrays of primitives.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.ArrayType(T.LongType()), False),
        T.StructField("last_us", T.ArrayType(T.LongType()), False),
        T.StructField("n", T.ArrayType(T.LongType()), False),
        T.StructField("s", T.ArrayType(T.DoubleType()), False),
    ]
)


def _fmt(us: int) -> str:
    return dt.datetime.fromtimestamp(us / 1_000_000, dt.timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def _coalesce(ivs: list[list], gap_us: int) -> list[list]:
    """Merge every pair of intervals closer than ``gap_us`` — the
    session-window closure of a sorted interval list. Events were
    appended as singleton intervals, so one sorted sweep computes the
    same sessions the batch operator would (bridging events merge
    transitively)."""
    ivs.sort(key=lambda x: (x[0], x[1]))
    merged: list[list] = []
    for iv in ivs:
        if merged and iv[0] - merged[-1][1] < gap_us:
            m = merged[-1]
            m[1] = max(m[1], iv[1])
            m[2] += iv[2]
            m[3] += iv[3]
        else:
            merged.append(list(iv))
    return merged


def _session_fn(gap_us: int):
    def _emit(user_id: int, done: list[list]) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(done),
                "session_start": [_fmt(iv[0]) for iv in done],
                "n_events": [iv[2] for iv in done],
                "sum_value": [iv[3] for iv in done],
            }
        )

    def _load(state: GroupState) -> list[list]:
        if not state.exists:
            return []
        starts, lasts, ns, ss = state.get
        return [
            [int(a), int(b), int(c), float(d)]
            for a, b, c, d in zip(starts, lasts, ns, ss)
        ]

    def fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ivs = _load(state)
        if not state.hasTimedOut:
            for batch in batches:
                ts_us = (batch["ts"].astype("int64") // 1000).tolist()
                vals = batch["value"].tolist()
                ivs.extend([t, t, 1, float(v)] for t, v in zip(ts_us, vals))
            ivs = _coalesce(ivs, gap_us)
        # seal every interval the watermark has passed: no admissible
        # future event (ts ≥ wm ≥ last+gap) can extend or merge it
        wm_us = state.getCurrentWatermarkMs() * 1000
        done = [iv for iv in ivs if iv[1] + gap_us <= wm_us]
        live = [iv for iv in ivs if iv[1] + gap_us > wm_us]
        if live:
            state.update(
                (
                    [iv[0] for iv in live],
                    [iv[1] for iv in live],
                    [iv[2] for iv in live],
                    [iv[3] for iv in live],
                )
            )
            # wake when the earliest live interval becomes sealable; a
            # timestamp at/behind the watermark is rejected → clamp to
            # wm+1 so the flush fires on the next micro-batch instead
            due_ms = min(iv[1] + gap_us for iv in live) // 1000
            state.setTimeoutTimestamp(
                max(due_ms, state.getCurrentWatermarkMs() + 1)
            )
        elif state.exists:
            state.remove()
        if done:
            yield _emit(user_id, done)

    return fn


def stateful_sessionize(
    events: DataFrame, gap_minutes: float = 5.0
) -> DataFrame:
    """Sessionize a *streaming* events relation with explicit state.

    ``events`` needs a watermark on ``ts`` (see windows.with_watermark)
    so the event-time timeout can flush sessions the watermark sealed.
    Output (and emission timing) matches ``windows.sessionize`` run
    through a streaming ``session_window`` in append mode — including
    merging sub-watermark stragglers with each other, verified by the
    batch-agreement tests in tests/test_stateful.py.
    """
    gap_us = int(gap_minutes * 60 * 1_000_000)
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_us),
            SESSION_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
