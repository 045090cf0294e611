"""Runtime storage-backend selection (backend.py, SURVEY.md §7.5)."""

from __future__ import annotations

from lakehouse_tools_spark import backend


def _reset():
    backend._FORMAT = None


def test_parquet_is_active_without_delta(monkeypatch):
    # this environment has no delta-spark wheel; detection must land
    # on parquet (if delta ever appears here, the assert flips and the
    # Delta branches in operators/writer.py take over)
    _reset()
    monkeypatch.delenv("SPARK_GRAFT_TABLE_FORMAT", raising=False)
    try:
        expected = "delta" if backend.delta_available() else "parquet"
        assert backend.table_format() == expected
        assert backend.delta_builder_confs() == (
            {} if expected == "parquet" else backend.delta_builder_confs()
        )
    finally:
        _reset()


def test_env_override_pins_format(monkeypatch):
    _reset()
    monkeypatch.setenv("SPARK_GRAFT_TABLE_FORMAT", "parquet")
    try:
        assert backend.table_format() == "parquet"
        assert backend.delta_builder_confs() == {}
        # identity builder wrap on the parquet path
        sentinel = object()
        assert backend.finalize_builder(sentinel) is sentinel
    finally:
        _reset()


def test_format_is_cached_per_process(monkeypatch):
    _reset()
    monkeypatch.setenv("SPARK_GRAFT_TABLE_FORMAT", "parquet")
    try:
        assert backend.table_format() == "parquet"
        # changing the env after first resolution must NOT flip the
        # format mid-process (mixed-format tables)
        monkeypatch.setenv("SPARK_GRAFT_TABLE_FORMAT", "delta")
        assert backend.table_format() == "parquet"
    finally:
        _reset()
