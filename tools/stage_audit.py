"""Stage-metric audit for melt-class defects (VERDICT r07 item 7).

The r07 profiler cliff's signature was per-STAGE, not per-query:
partial-aggregate hash maps outgrowing their execution-memory share
show up as super-linear executor CPU + GC with spill onset while
shuffle output stays flat. This tool runs a registered query at one
or more fixture dirs in a FRESH process each (eventLog enabled,
parsed after the run) and prints per-stage totals so "does the
partial-agg working set stay bounded under the operator's row
expansion" is a measured verdict, not an eyeballed timing.

Usage::

    python tools/stage_audit.py <query> <sf_dir> [sf_dir ...] [conf=value ...]

Per sf_dir, prints one JSON line::

    {"query":..., "sf_dir":..., "wall_sec":..., "stages": [
       {"stage":..., "cpu_sec":..., "gc_sec":..., "spill_mem_gb":...,
        "spill_disk_gb":..., "shuffle_write_gb":..., "tasks":...}, ...],
     "total_spill_disk_gb":..., "total_cpu_sec":...}

Stages are sorted by cpu_sec desc (top 8). A second invocation at 2x
the data answers the audit question: bounded working sets scale CPU
~linearly with ZERO spill; a melt-class defect shows CPU ratio >>
data ratio with spill onset at the bigger point.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


def _empty_stage(sid: int) -> dict:
    return {
        "stage": sid,
        "wall_ms": 0,
        "cpu_ns": 0,
        "run_ms": 0,
        "gc_ms": 0,
        "spill_mem": 0,
        "spill_disk": 0,
        "shuffle_write": 0,
        "input_bytes": 0,
        "tasks": 0,
    }


def _run_one(query: str, sf_dir: str, confs: list[str]) -> dict:
    """Child-process body: run the query once with eventLog on, parse."""
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __spark_entry__ as E
    from lakehouse_tools_spark.session import get_session

    evdir = tempfile.mkdtemp(prefix="lts_stage_audit_")
    try:
        extra = {
            "spark.ui.showConsoleProgress": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        }
        for kv in confs:
            k, _, v = kv.partition("=")
            extra[k] = v
        spark = get_session(app_name="stage_audit", extra_confs=extra)
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        t0 = time.time()
        E.queries()[query](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.time() - t0
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
        # flush the event log by stopping the session
        spark.stop()
        stages: dict[int, dict] = {}
        # Spark 4 writes rolling event-log v2 DIRECTORIES; collect
        # every plain event file beneath evdir
        files = [
            p
            for p in glob.glob(os.path.join(evdir, "**", "*"), recursive=True)
            if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
        ]
        for f in files:
            with open(f) as fh:
                for line in fh:
                    try:
                        ev = json.loads(line)
                    except ValueError:
                        continue
                    if ev.get("Event") == "SparkListenerStageCompleted":
                        si = ev.get("Stage Info") or {}
                        sid = si.get("Stage ID")
                        sub, comp = si.get("Submission Time"), si.get(
                            "Completion Time"
                        )
                        if sid is not None and sub and comp:
                            s = stages.setdefault(sid, _empty_stage(sid))
                            # stage wall: submission -> completion — the
                            # number that separates "CPU-bound" from
                            # "blocked on reads" (cold-IO windows show
                            # wall >> cpu/tasks with zero spill)
                            s["wall_ms"] = comp - sub
                        continue
                    if ev.get("Event") != "SparkListenerTaskEnd":
                        continue
                    sid = ev.get("Stage ID")
                    m = ev.get("Task Metrics") or {}
                    sw = m.get("Shuffle Write Metrics") or {}
                    im = m.get("Input Metrics") or {}
                    s = stages.setdefault(sid, _empty_stage(sid))
                    s["cpu_ns"] += m.get("Executor CPU Time", 0)
                    s["run_ms"] += m.get("Executor Run Time", 0)
                    s["gc_ms"] += m.get("JVM GC Time", 0)
                    s["spill_mem"] += m.get("Memory Bytes Spilled", 0)
                    s["spill_disk"] += m.get("Disk Bytes Spilled", 0)
                    s["shuffle_write"] += sw.get("Shuffle Bytes Written", 0)
                    s["input_bytes"] += im.get("Bytes Read", 0)
                    s["tasks"] += 1
        rows = [
            {
                "stage": s["stage"],
                "wall_sec": round(s["wall_ms"] / 1e3, 2),
                "cpu_sec": round(s["cpu_ns"] / 1e9, 2),
                "run_sec": round(s["run_ms"] / 1e3, 2),
                "gc_sec": round(s["gc_ms"] / 1e3, 2),
                "spill_mem_gb": round(s["spill_mem"] / 1e9, 3),
                "spill_disk_gb": round(s["spill_disk"] / 1e9, 3),
                "shuffle_write_gb": round(s["shuffle_write"] / 1e9, 3),
                "input_mb": round(s["input_bytes"] / 1e6, 1),
                "tasks": s["tasks"],
            }
            for s in stages.values()
        ]
        # sort by stage WALL, not cpu: the blocked-on-reads stage that
        # owns a degraded window's latency can have near-zero CPU
        rows.sort(key=lambda r: -max(r["wall_sec"], r["cpu_sec"] / 32))
        return {
            "query": query,
            "sf_dir": sf_dir,
            "extra_confs": confs,
            "wall_sec": round(wall, 2),
            "total_cpu_sec": round(sum(r["cpu_sec"] for r in rows), 2),
            "total_gc_sec": round(sum(r["gc_sec"] for r in rows), 2),
            "total_spill_disk_gb": round(
                sum(r["spill_disk_gb"] for r in rows), 3
            ),
            "total_shuffle_write_gb": round(
                sum(r["shuffle_write_gb"] for r in rows), 3
            ),
            "stages": rows[:8],
        }
    finally:
        shutil.rmtree(evdir, ignore_errors=True)


def main() -> None:
    if os.environ.get("STAGE_AUDIT_CHILD") == "1":
        print(json.dumps(_run_one(sys.argv[1], sys.argv[2], sys.argv[3:])))
        return
    query = sys.argv[1]
    confs = [a for a in sys.argv[2:] if "=" in a]
    for sf_dir in [a for a in sys.argv[2:] if "=" not in a]:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), query, sf_dir, *confs],
            env=dict(os.environ, STAGE_AUDIT_CHILD="1"),
            stdout=subprocess.PIPE,
            text=True,
        )
        out = proc.stdout.strip().splitlines()
        print(out[-1] if out else json.dumps({"query": query, "sf_dir": sf_dir, "error": f"rc={proc.returncode}"}))


if __name__ == "__main__":
    main()
