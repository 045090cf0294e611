"""Custom stateful streaming operator: explicit-state sessionization
via ``applyInPandasWithState``.

``streaming.windows.sessionize`` uses the native ``session_window``;
this module is the escape hatch for session semantics the built-in
can't express (per-key dynamic gaps, session-level derived features,
caps on session length) — the pattern every custom stateful operator
follows: group → Arrow batches + a typed ``GroupState`` → emit rows,
with an event-time timeout bounding state under the watermark.

State per key is one open session ``(start_us, last_us, n, sum)``
(32 bytes — independent of event volume, the property that matters
when 10^9 users hold state simultaneously). Closed sessions are
emitted as soon as a later event proves a gap ≥ the configured gap;
the final open session is flushed by watermark timeout (streaming) or
on end-of-input (batch helper below).
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

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), False),
        T.StructField("last_us", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("s", T.DoubleType(), False),
    ]
)


def _fmt(us: int) -> str:
    return dt.datetime.fromtimestamp(us / 1_000_000, dt.timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def _session_fn(gap_us: int):
    def fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, s = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [_fmt(start)],
                    "n_events": [n],
                    "sum_value": [s],
                }
            )
            return

        open_sess = list(state.get) if state.exists else None
        closed: list[tuple[int, int, float]] = []
        for batch in batches:
            ts_us = (batch["ts"].astype("int64") // 1000).tolist()
            vals = batch["value"].tolist()
            for t_us, v in sorted(zip(ts_us, vals)):
                if open_sess is None:
                    open_sess = [t_us, t_us, 1, float(v)]
                elif t_us - open_sess[1] >= gap_us:
                    # strictly after the open interval: close it, start new
                    closed.append((open_sess[0], open_sess[2], open_sess[3]))
                    open_sess = [t_us, t_us, 1, float(v)]
                elif open_sess[0] - t_us >= gap_us:
                    # late event strictly BEFORE the open interval (arrived
                    # in a later micro-batch, still inside the watermark):
                    # it can never merge with the open session, and the open
                    # session already owns all later time — emit it as its
                    # own closed session. (Several such stragglers that
                    # would natively merge with each other are emitted
                    # individually — the one divergence from session_window,
                    # bounded to sub-watermark out-of-order arrivals.)
                    closed.append((t_us, 1, float(v)))
                else:
                    # inside (or gap-adjacent to) the open interval: merge.
                    # min/max, NOT assignment — a late event must never move
                    # the session end backwards or the next on-time event
                    # would wrongly split the session.
                    open_sess[0] = min(open_sess[0], t_us)
                    open_sess[1] = max(open_sess[1], t_us)
                    open_sess[2] += 1
                    open_sess[3] += float(v)
        if open_sess is not None:
            state.update(tuple(open_sess))
            # flush the open session once the watermark passes last+gap;
            # if the watermark is already past it (late stragglers were
            # the only input), clamp — a timeout timestamp at/behind the
            # watermark is rejected, and wm+1 fires on the next batch
            due_ms = (open_sess[1] + gap_us) // 1000
            state.setTimeoutTimestamp(max(due_ms, state.getCurrentWatermarkMs() + 1))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [_fmt(c[0]) for c in closed],
                    "n_events": [c[1] for c in closed],
                    "sum_value": [c[2] for c in closed],
                }
            )

    return fn


def stateful_sessionize(
    events: DataFrame, gap_minutes: float = 5.0
) -> DataFrame:
    """Sessionize a *streaming* events relation with explicit state.

    ``events`` needs a watermark on ``ts`` (see windows.with_watermark)
    so the event-time timeout can flush open sessions. Output matches
    ``windows.sessionize``'s contract.
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
