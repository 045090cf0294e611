"""Sessionization on the modern ``transformWithStateInPandas`` API.

``streaming.stateful`` implements explicit-state sessionization on
``applyInPandasWithState`` (Spark 3.4's state API). Spark 4 replaced
that API with ``transformWithState``: typed state handles (value /
list / map) instead of one tuple blob, first-class event-time TIMERS
instead of a single timeout slot, and a state layout (one RocksDB
column family per handle) that supports state-schema evolution and
multiple independent variables per operator. This module is the same
operator — identical session semantics, output schema, and emission
timing — re-expressed on the new API, so the engine exercises the
binding production Spark 4 clusters will standardize on:

- state: ONE ``ListState`` of unsealed session intervals
  ``(start_us, last_us, n, s)``; the interval-SET representation is
  shared with the legacy operator (``stateful._coalesce``), which is
  what makes sub-watermark stragglers merge exactly like the batch
  ``session_window`` operator.
- timers: each batch (re-)arms an event-time timer per touched key
  at the earliest point the watermark can seal a live interval
  (clamped past the current watermark — a timer at/behind it would
  never fire). Expired timers re-run the same seal step, so a key
  whose stream goes quiet still flushes without new input — the
  behavior the legacy API expressed through
  ``GroupStateTimeout.EventTimeTimeout``. Timers from earlier
  batches are deliberately left in place: a stale fire is an
  idempotent no-op (seals what the watermark allows, re-arms iff
  live intervals remain), bounded by the number of batches the key
  appeared in — so the list+delete round-trips buy nothing (and
  were A/B-measured neutral; see the note in ``_load``).
- sealing: an interval is emitted and dropped once
  ``watermark >= last_event + gap`` — after which no admissible event
  can extend or merge it. State is 32 bytes per live interval,
  bounded by ``delayThreshold / gap`` intervals per key, independent
  of event volume (same bound as the legacy operator).

Runtime requirements (both probed, with a documented fallback):

- ``transformWithState`` stores each state variable in its own column
  family, which only ``RocksDBStateStoreProvider`` supports — wrap
  query *start* in :func:`rocksdb_state_store` (the conf is read when
  the stream starts, not when the plan is built).
- The JVM talks to the stateful processor through a protobuf
  channel, so the Python workers need ``google.protobuf``. This
  sandbox has no protobuf wheel (no network; the dated note in
  ``backend.py`` documents the same constraint for delta-spark), but
  a complete pure-Python protobuf runtime ships inside the installed
  Cloud SDK. :func:`ensure_tws_runtime` exposes it through a narrow
  shim — a ``google/`` package dir containing ONLY a ``protobuf``
  symlink, so none of the SDK's other vendored packages can shadow
  site-packages — plus protobuf's own documented
  ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` escape hatch (the
  vendored runtime is 6.32 vs pyspark gencode 6.33 — one minor
  version, within protobuf's same-major wire guarantees). The shim
  must be in the env BEFORE the JVM starts so spawned Python workers
  inherit it; ``session.get_session`` calls it, and
  :func:`tws_runtime_ready` probes a live session so callers with a
  foreign-built JVM (the driver harness) can fall back to the
  ``applyInPandasWithState`` twin, which is result-identical.

Reference parity: the reference notebook has no stateful streaming
at all (its only incremental surface is MERGE-restatement, dbc
cell@0.5); this operator family is part of the beyond-reference
LLM-pipeline brief, sessionization being the canonical custom
stateful op.
"""

from __future__ import annotations

import os
import sys
import tempfile
from contextlib import contextmanager
from typing import TYPE_CHECKING, Iterator

import pandas as pd

from pyspark.sql import DataFrame

from lakehouse_tools_spark.streaming.stateful import (
    SESSION_SCHEMA,
    _coalesce,
    _fmt,
)

if TYPE_CHECKING:  # imported lazily at run time — see StatefulProcessor note
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessorHandle,
        TimerValues,
    )

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
_PB_FLAG = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"

#: Known locations of a complete vendored pure-Python protobuf runtime
#: (a dir whose ``google/protobuf`` subtree imports with plain
#: ``google.protobuf`` module paths). Extendable via $LTS_PROTOBUF_DIR.
_VENDORED_PROTOBUF_ROOTS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def _protobuf_importable() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


def ensure_tws_runtime() -> bool:
    """Make ``google.protobuf`` importable for this process AND for
    Python workers of any JVM started after this call.

    No-op when protobuf is already importable. Otherwise builds the
    narrow shim (``<tmp>/lts_pbshim/google/protobuf`` symlink), adds
    it to ``sys.path`` + ``$PYTHONPATH``, and sets protobuf's
    documented version-check escape hatch. Returns True iff
    ``google.protobuf`` imports afterwards. Call BEFORE SparkSession
    construction — a live JVM's env is frozen at launch, so this
    cannot retrofit an already-running session (that is what
    :func:`tws_runtime_ready` detects).
    """
    if _protobuf_importable():
        return True
    roots = list(_VENDORED_PROTOBUF_ROOTS)
    if os.environ.get("LTS_PROTOBUF_DIR"):
        roots.insert(0, os.environ["LTS_PROTOBUF_DIR"])
    src = next(
        (
            os.path.join(r, "google", "protobuf")
            for r in roots
            if os.path.isfile(
                os.path.join(r, "google", "protobuf", "descriptor.py")
            )
        ),
        None,
    )
    if src is None:
        return False
    shim = os.path.join(tempfile.gettempdir(), "lts_pbshim")
    pkg = os.path.join(shim, "google")
    try:
        os.makedirs(pkg, exist_ok=True)
        init = os.path.join(pkg, "__init__.py")
        if not os.path.exists(init):
            open(init, "w").close()
        link = os.path.join(pkg, "protobuf")
        if not os.path.exists(link):
            os.symlink(src, link)
    except OSError:
        return False
    if shim not in sys.path:
        sys.path.insert(0, shim)
    parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if shim not in parts:
        os.environ["PYTHONPATH"] = os.pathsep.join(
            [shim] + [p for p in parts if p]
        )
    # vendored runtime may trail pyspark's gencode by a minor version;
    # protobuf's own escape hatch, scoped to same-major wire compat
    os.environ.setdefault(_PB_FLAG, "true")
    return _protobuf_importable()


def tws_runtime_ready(spark) -> bool:
    """True iff ``transformWithStateInPandas`` can run on THIS session.

    Needs (a) ``google.protobuf`` importable in this interpreter, and
    (b) the live JVM's env able to spawn workers that import it too.
    The JVM env is frozen at launch: if the driver-side import only
    works through the shim, the JVM must carry the shim's
    ``$PYTHONPATH`` entry (plus the version flag) or its workers will
    crash on import. Sessions built by ``session.get_session`` after
    :func:`ensure_tws_runtime` pass; a foreign JVM launched without
    the env does not, and callers fall back to the legacy twin.
    """
    if not _protobuf_importable():
        return False
    import google.protobuf as pb

    shim = os.path.join(tempfile.gettempdir(), "lts_pbshim")
    if not os.path.realpath(pb.__file__).startswith(
        os.path.realpath(shim) + os.sep
    ) and "lts_pbshim" not in pb.__file__:
        return True  # real installed protobuf: workers see it too
    try:
        jenv = spark._jvm.java.lang.System.getenv("PYTHONPATH") or ""
        jflag = spark._jvm.java.lang.System.getenv(_PB_FLAG) or ""
    except Exception:
        return False
    return shim in jenv.split(os.pathsep) and jflag.lower() == "true"


@contextmanager
def rocksdb_state_store(spark):
    """Scope ``RocksDBStateStoreProvider`` around a streaming query
    START (the provider conf is read when the query starts and then
    baked into its checkpoint; already-running queries are
    unaffected). transformWithState keeps each state variable in its
    own column family, which the default HDFS-backed provider rejects
    (`STATE_STORE_MULTIPLE_COLUMN_FAMILIES`). Restores the previous
    value on exit so unrelated queries keep the session default.
    """
    try:
        prev = spark.conf.get(_PROVIDER_CONF)
    except Exception:
        prev = None
    spark.conf.set(_PROVIDER_CONF, ROCKSDB_PROVIDER)
    try:
        yield
    finally:
        if prev is None:
            try:
                spark.conf.unset(_PROVIDER_CONF)
            except Exception:
                pass
        else:
            spark.conf.set(_PROVIDER_CONF, prev)


def _make_processor(gap_us: int):
    """Build the StatefulProcessor class lazily: importing
    ``pyspark.sql.streaming.stateful_processor`` is cheap, but doing
    it at module import would make this module unimportable on
    environments where the optional runtime probe should decide —
    keep the import inside so ``ensure_tws_runtime``/fallback logic
    runs even when the API is absent.

    Timer arming is PER-BATCH: every batch that leaves live
    intervals re-arms the key's timer — one registerTimer RPC per
    touched key per batch; stale earlier timers fire idempotently
    (they seal what the watermark allows and re-arm iff live
    intervals remain). An alternative "min-armed" strategy — a
    worker-local cache of each key's earliest armed due time,
    skipping the RPC when an armed timer is already due no later —
    was A/B-measured NEUTRAL at sf5 (paired interleaved median
    0.981, SCALING.md "TWS constant factor"; the 1.5x TWS-vs-legacy
    factor lives in state-server serialization + RocksDB
    maintenance) and then REMOVED in r09: the cache is only safe
    when LOST (key re-arms once), not when STALE-PRESENT — a
    long-lived processor instance retaining an entry while the
    key's timer is consumed on another worker (partition migration,
    speculative task) would suppress registerTimer when the key
    returns, leaving a session with live intervals and no further
    input never timer-sealed (ADVICE r08). Measured-neutral + a
    correctness hazard = deleted, not flagged.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    class SessionIntervalProcessor(StatefulProcessor):
        """Per-user session intervals in a ListState + one event-time
        timer per key at the earliest sealable point."""

        def init(self, handle: "StatefulProcessorHandle") -> None:
            self._handle = handle
            self._ivs = handle.getListState(
                "intervals", "start_us long, last_us long, n long, s double"
            )

        def _load(self) -> list[list]:
            # no exists() probe: get() on absent state already yields
            # an empty iterator (the client raises StopIteration on
            # the not-found status), so the extra per-key round-trip
            # buys nothing. NOTE the RPC-count hypothesis for the TWS
            # overhead was A/B-measured and REFUTED: trimming 3 of ~7
            # per-key round-trips (this probe + list/delete timers)
            # moved the sf5 noop drain 40.5 -> 41.7 s min-of-3, i.e.
            # neutral — the trim is kept for simplicity, not speed;
            # the TWS-vs-legacy gap lives elsewhere (state-server
            # serialization + RocksDB maintenance)
            return [
                [int(r[0]), int(r[1]), int(r[2]), float(r[3])]
                for r in self._ivs.get()
            ]

        def _seal_and_emit(
            self, user_id: int, ivs: list[list], wm_us: int
        ) -> Iterator[pd.DataFrame]:
            done = [iv for iv in ivs if iv[1] + gap_us <= wm_us]
            live = [iv for iv in ivs if iv[1] + gap_us > wm_us]
            self._ivs.clear()
            if live:
                self._ivs.put([tuple(iv) for iv in live])
                due_ms = min(iv[1] + gap_us for iv in live) // 1000
                # a timer at/behind the watermark never fires: clamp
                # one ms past it so the flush lands next micro-batch.
                # Earlier timers from previous batches are NOT listed
                # and deleted (2 more per-key RPCs): a stale timer
                # firing is idempotent — it seals what the watermark
                # allows (possibly nothing) and re-arms iff live
                # intervals remain — and the outstanding-timer count
                # is bounded by the batches a key appeared in, so
                # correctness and state size are unaffected
                due_ms = max(due_ms, wm_us // 1000 + 1)
                self._handle.registerTimer(due_ms)
            if done:
                yield pd.DataFrame(
                    {
                        "user_id": [user_id] * len(done),
                        "session_start": [_fmt(iv[0]) for iv in done],
                        "n_events": [iv[2] for iv in done],
                        "sum_value": [iv[3] for iv in done],
                    }
                )

        def handleInputRows(
            self, key, rows, timerValues: "TimerValues"
        ) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            ivs = self._load()
            for batch in rows:
                ts_us = (batch["ts"].astype("int64") // 1000).tolist()
                vals = batch["value"].tolist()
                ivs.extend(
                    [t, t, 1, float(v)] for t, v in zip(ts_us, vals)
                )
            ivs = _coalesce(ivs, gap_us)
            wm_us = timerValues.getCurrentWatermarkInMs() * 1000
            yield from self._seal_and_emit(user_id, ivs, wm_us)

        def handleExpiredTimer(
            self, key, timerValues: "TimerValues", expiredTimerInfo
        ) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            wm_us = timerValues.getCurrentWatermarkInMs() * 1000
            yield from self._seal_and_emit(user_id, self._load(), wm_us)

        def close(self) -> None:
            pass

    return SessionIntervalProcessor()


def stateful_sessionize_tws(
    events: DataFrame, gap_minutes: float = 5.0
) -> DataFrame:
    """Sessionize a *streaming* events relation via
    ``transformWithStateInPandas`` (Spark 4 state API).

    Drop-in twin of :func:`streaming.stateful.stateful_sessionize`:
    same input contract (watermark on ``ts``), same output schema and
    values, same emission timing — pinned against the legacy operator
    and the native ``session_window`` in tests/test_tws.py. Start the
    returned stream under :func:`rocksdb_state_store`, and check
    :func:`tws_runtime_ready` first when the session's JVM may have
    been launched without the protobuf runtime.
    """
    gap_us = int(gap_minutes * 60 * 1_000_000)
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_make_processor(gap_us),
            outputStructType=SESSION_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
