"""A/B probe: RocksDB state-store memory/write-buffer confs vs the
defaults on the TWS sessionizer drain (VERDICT r09 item 4).

The sf5/sf10 TWS drains show 2–3x session-to-session variance
(SCALING.md pinned drains [47.8 → 101.1 s] with identical plans,
attributed to JVM heap churn). This measures whether the variance —
or the sf10 floor itself — is conf-sensitive: each variant wraps the
IDENTICAL noop-sink availableNow drain (tools/scale_bench.py
``_sessionize_tws_to_noop``) in a set of
``spark.sql.streaming.stateStore.rocksdb.*`` session confs, which the
provider reads at query START, so no session restart is needed.

Variants (each a documented RocksDB-provider knob):

- ``base``     — session defaults (what every measured curve used).
- ``notrack``  — ``trackTotalNumberOfRows=false``: skips the
  read-before-write RocksDB does per put/delete to maintain exact row
  counts; the documented first knob for write-heavy state.
- ``buffers``  — ``writeBufferSizeMB=128, maxWriteBufferNumber=4``:
  larger/more memtables, fewer flushes per batch.
- ``bounded``  — ``boundedMemoryUsage=true, maxMemoryUsageMB=8192``:
  one shared block-cache/memtable budget across all store instances
  (32 partition stores on local[32] otherwise size independently).

Decision rule (pre-registered in the round notes): adopt a variant
into ``rocksdb_state_store`` only if min-of-RUNS beats base by >=20%
with clean sentinel brackets; otherwise pin the conf-insensitivity
note in SCALING.md. min-of-N is the right statistic for an adoption
decision against heap-churn noise: churn only ever ADDS time, so the
min is the conf's true floor.

Usage::  python tools/ab_rocksdb.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import host_sentinel as HS  # noqa: E402
from scale_bench import _sessionize_tws_to_noop  # noqa: E402

from lakehouse_tools_spark.session import get_session  # noqa: E402

_PFX = "spark.sql.streaming.stateStore.rocksdb."

VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "notrack": {_PFX + "trackTotalNumberOfRows": "false"},
    "buffers": {
        _PFX + "writeBufferSizeMB": "128",
        _PFX + "maxWriteBufferNumber": "4",
    },
    "bounded": {
        _PFX + "boundedMemoryUsage": "true",
        _PFX + "maxMemoryUsageMB": "8192",
    },
    "combo": {
        _PFX + "trackTotalNumberOfRows": "false",
        _PFX + "writeBufferSizeMB": "128",
        _PFX + "maxWriteBufferNumber": "4",
        _PFX + "boundedMemoryUsage": "true",
        _PFX + "maxMemoryUsageMB": "8192",
    },
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale_fixtures/sf10"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    if runs < 1:
        raise SystemExit("runs must be >= 1")
    spark = get_session(
        app_name="ab_rocksdb",
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    only = os.environ.get("AB_ROCKSDB_VARIANTS")
    names = list(VARIANTS)
    if only:
        keep = set(only.split(","))
        names = [n for n in names if n in keep]

    out: dict[str, dict] = {}
    # warm-up bias guard: a cold-session base systematically inflates
    # every ratio_vs_base toward adoption (measured: base drifted
    # 94.5 -> 63.5 s across this harness's own r10 sessions). When
    # base is compared against anything, measure it FIRST and AGAIN
    # LAST and keep the min — the repeat rules out "variant looked
    # faster only because it ran warmer".
    if "base" in names and len(names) > 1:
        names = names + ["base"]
    for name in names:
        confs = VARIANTS[name]
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            attempt_brackets = []
            for attempt in (1, 2):
                pre = HS.probe_quick()
                best, times = float("inf"), []
                for _ in range(runs):
                    t0 = time.time()
                    _sessionize_tws_to_noop(spark, sf_dir)
                    dt = time.time() - t0
                    times.append(round(dt, 3))
                    best = min(best, dt)
                post = HS.probe_quick()
                clean = HS.brackets_agree(pre, post)
                # every attempt's probes ride in the record (ADVICE
                # r11): a dirty first bracket forces a retry whose
                # runs replace the dirty ones, but its sentinel
                # evidence must still be published — otherwise
                # attempts=2 with a single bracket pair under-reports
                # what the harness saw within this measurement block
                attempt_brackets.append(
                    {"attempt": attempt, "clean": clean,
                     "runs": list(times), "pre": pre, "post": post}
                )
                if clean:
                    break
            rec = {
                "sec": round(best, 3),
                "all_runs": times,
                "confs": confs,
                "bracket_clean": clean,
                # one bracket entry PER attempt, dirty retries
                # included (ADVICE r10 + r11): the end-of-session
                # base re-measure must not overwrite the first base
                # run's sentinel evidence, and a dirty first attempt
                # must not vanish behind its clean retry
                "brackets": attempt_brackets,
            }
            if name in out:  # the end-of-session base re-measure
                prior = out[name]
                rec["all_runs"] = prior["all_runs"] + times
                rec["sec"] = min(prior["sec"], rec["sec"])
                rec["bracket_clean"] = prior["bracket_clean"] and clean
                rec["brackets"] = prior["brackets"] + rec["brackets"]
            out[name] = rec
            print(
                f"# {name}: min {out[name]['sec']}s of "
                f"{out[name]['all_runs']} clean={out[name]['bracket_clean']}",
                file=sys.stderr,
            )
        finally:
            for k in confs:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
        spark.catalog.clearCache()
    if "base" in out and out["base"]["sec"] > 0:
        for rec in out.values():
            rec["ratio_vs_base"] = round(rec["sec"] / out["base"]["sec"], 3)
    print(
        json.dumps({"sf_dir": sf_dir, "runs": runs, "variants": out}, indent=1)
    )


if __name__ == "__main__":
    main()
