"""A/B probes for the TWS sessionizer's ~1.5x constant factor vs the
legacy applyInPandasWithState operator (VERDICT r07 item 5).

The r07 head-to-head pinned the factor (~1.5x at sf5, parallel
scaling curves) and REFUTED the per-key-RPC-count hypothesis
(trimming 3 of ~7 round-trips: 40.5 -> 41.7 s, neutral). The two
remaining suspects get one measured A/B each here:

- ``arrow``: the state-server/data channel Arrow batch size —
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (default 10k)
  governs how many rows each ArrowRecordBatch carries between the
  JVM and the Python stateful worker; run the identical noop-sink
  drain at 1k / 10k / 100k.
- ``timer``: per-batch timer re-arming vs the ``min-armed``
  worker-local cache (streaming/tws.py ``timer_arm``), which skips
  the registerTimer RPC when an earlier-due timer is already armed.

Every variant is min-of-RUNS in ONE shared session (streaming drains
need ``streams.resetTerminated`` isolation, same as scale_bench),
with the legacy operator measured alongside for the ratio, and each
variant bracketed by sentinel quick probes — a variant whose
brackets disagree >1.3x is re-measured once and flagged if still
dirty.

Usage::  python tools/ab_tws.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import host_sentinel as HS  # noqa: E402
from scale_bench import (  # noqa: E402
    _sessionize_to_noop,
    _sessionize_tws_to_noop,
)

from lakehouse_tools_spark.session import get_session  # noqa: E402

_ARROW_CONF = "spark.sql.execution.arrow.maxRecordsPerBatch"


def _tws_drain(spark, sf_dir: str, timer_arm: str) -> None:
    """The scale_bench TWS noop drain with a selectable timer-arm
    strategy (duplicating the tiny harness body is worse than this
    late-bound monkey-patch would be fragile; instead re-build the
    drain directly)."""
    import datetime
    import shutil
    import tempfile

    from lakehouse_tools_spark.sources.tables import load_stream
    from lakehouse_tools_spark.streaming import windows as X_win
    from lakehouse_tools_spark.streaming.joins import flush_sentinel_union
    from lakehouse_tools_spark.streaming.tws import (
        rocksdb_state_store,
        stateful_sessionize_tws,
    )

    stream = load_stream(spark, sf_dir, "events").select(
        "user_id", "ts", "value"
    )
    d = tempfile.mkdtemp(prefix="lts_ab_tws_")
    try:
        withsent = flush_sentinel_union(
            stream,
            {"user_id": -1, "ts": datetime.datetime(2030, 1, 1), "value": 0.0},
            d,
        )
        sessions = stateful_sessionize_tws(
            X_win.with_watermark(withsent, "ts", "10 minutes"),
            gap_minutes=5,
            timer_arm=timer_arm,
        )
        with rocksdb_state_store(spark):
            q = (
                sessions.writeStream.format("noop")
                .outputMode("append")
                .option("checkpointLocation", os.path.join(d, "_ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        spark.streams.resetTerminated()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale_fixtures/sf5"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_session(
        app_name="ab_tws",
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    default_arrow = spark.conf.get(_ARROW_CONF)

    def set_arrow(v):
        if v is None:
            spark.conf.set(_ARROW_CONF, default_arrow)
        else:
            spark.conf.set(_ARROW_CONF, str(v))

    variants = [
        ("legacy", lambda: _sessionize_to_noop(spark, sf_dir)),
        ("tws_base", lambda: _sessionize_tws_to_noop(spark, sf_dir)),
        ("tws_arrow_1k", lambda: _tws_drain(spark, sf_dir, "per-batch"), 1000),
        (
            "tws_arrow_100k",
            lambda: _tws_drain(spark, sf_dir, "per-batch"),
            100_000,
        ),
        ("tws_min_armed", lambda: _tws_drain(spark, sf_dir, "min-armed")),
    ]
    only = os.environ.get("AB_TWS_VARIANTS")
    if only:
        keep = set(only.split(","))
        variants = [v for v in variants if v[0] in keep]
    out = {}
    for spec in variants:
        name, fn = spec[0], spec[1]
        arrow = spec[2] if len(spec) > 2 else None
        set_arrow(arrow)
        try:
            for attempt in (1, 2):
                pre = HS.probe_quick()
                best = float("inf")
                for _ in range(runs):
                    t0 = time.time()
                    fn()
                    best = min(best, time.time() - t0)
                post = HS.probe_quick()
                clean = HS.brackets_agree(pre, post)
                if clean:
                    break
            out[name] = {
                "sec": round(best, 3),
                "arrow_max_records": arrow or int(default_arrow),
                "bracket_clean": clean,
                "attempts": attempt,
                "pre": pre,
                "post": post,
            }
            print(f"# {name}: {out[name]['sec']}s clean={clean}", file=sys.stderr)
        finally:
            set_arrow(None)
        spark.catalog.clearCache()
    if "legacy" in out and out["legacy"]["sec"] > 0:
        for name, rec in out.items():
            rec["ratio_vs_legacy"] = round(rec["sec"] / out["legacy"]["sec"], 3)
    print(json.dumps({"sf_dir": sf_dir, "runs": runs, "variants": out}, indent=1))


if __name__ == "__main__":
    main()
