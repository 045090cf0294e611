"""Session conf-map tests: the bounded-memory RocksDB streaming
preset (VERDICT r10 item 3 — the r10 A/B's production note wired as
tested code, SCALING.md "RocksDB state-store conf A/B")."""

from __future__ import annotations

from lakehouse_tools_spark.session import get_session, streaming_state_confs

_PFX = "spark.sql.streaming.stateStore.rocksdb."
_PROVIDER = "spark.sql.streaming.stateStore.providerClass"


def test_preset_shape_defaults():
    confs = streaming_state_confs()
    assert confs[_PFX + "boundedMemoryUsage"] == "true"
    assert confs[_PFX + "maxMemoryUsageMB"] == "8192"
    # metrics tracking off by default: the A/B's `notrack` variant —
    # each put/delete otherwise pays an extra lookup
    assert confs[_PFX + "trackTotalNumberOfRows"] == "false"
    assert confs[_PROVIDER].endswith("RocksDBStateStoreProvider")


def test_preset_parameterization():
    confs = streaming_state_confs(
        budget_mb=4096, track_rows=True, rocksdb_provider=False
    )
    assert confs[_PFX + "maxMemoryUsageMB"] == "4096"
    assert confs[_PFX + "trackTotalNumberOfRows"] == "true"
    assert _PROVIDER not in confs
    # budget coerces to an integral MB string (no "4096.0")
    assert streaming_state_confs(budget_mb=4096.0)[
        _PFX + "maxMemoryUsageMB"
    ] == "4096"


def test_callsite_debugging_disabled(spark):
    """Sessions built by :func:`get_session` disable PySpark's
    per-API-call call-site capture (optimization r12): with it on,
    every DataFrame/Column call pays a Python stack walk plus ~3
    py4j round trips of pure error-message decoration — measured
    2.18 s → 1.25 s warm construct over 8 declarative queries. The
    conf is Python-side and pyspark caches it PROCESS-GLOBALLY on the
    first DataFrame API call (is_debugging_enabled), so it must be
    pinned at builder time (DEFAULT_CONFS) — before any DataFrame
    call — not applied later via configure()."""
    from lakehouse_tools_spark.session import DEFAULT_CONFS, RUNTIME_CONFS

    key = "spark.python.sql.dataFrameDebugging.enabled"
    assert DEFAULT_CONFS[key] == "false"
    # excluded from RUNTIME_CONFS (the configure() source map) not
    # because setting it later would error — spark.conf.set succeeds —
    # but because pyspark's process-global flag cache makes a late set
    # a silent no-op; keeping it builder-time-only documents that
    # (ADVICE r12 wording fix)
    assert key not in RUNTIME_CONFS
    # and the shared test session (built by get_session) carries it
    assert spark.conf.get(key) == "false"


def test_preset_lands_on_session(spark):
    """The VERDICT-prescribed route — ``get_session(extra_confs=
    streaming_state_confs(...))`` — must land every conf on the live
    session (they are runtime SQL confs, so getOrCreate applies them
    to an existing session too)."""
    preset = streaming_state_confs(budget_mb=2048)
    before = {}
    for key in preset:
        try:
            before[key] = spark.conf.get(key)
        except Exception:
            before[key] = None
    try:
        got = get_session(
            app_name="lakehouse_tools_spark_tests", extra_confs=preset
        )
        for key, value in preset.items():
            assert got.conf.get(key) == value, key
    finally:
        # don't leak the provider pin / memory cap into other
        # streaming tests that assume session defaults
        for key, old in before.items():
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)
