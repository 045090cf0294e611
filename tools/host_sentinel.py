"""Host-condition sentinel: is this machine in a measurement-grade
window right now?

The sandbox host has documented slow windows (SCALING.md "sf10
extension and measurement isolation": a bracketed 97.4 s -> 19.9 s
profiler swing with GC/steal/JVM ruled out). Round 7 caught a second
kind — an I/O window where sequential parquet reads ran at
0.03 GB/s cold / 0.31 GB/s re-read vs 1.2 GB/s documented healthy —
which multiplies every scan-heavy measurement by up to ~40x and
produces exactly the super-linear-looking tails the scaling harness
exists to find. Round 7's closing evidence then showed the third,
subtler kind: two SAME-DAY windows both graded "healthy" at the old
0.8 GB/s cold threshold measured 0.99 vs 2.11 GB/s cold — a 2x gap
that dominates every small-query number — so "healthy" now requires
full-speed I/O and a MARGINAL band separates the in-between windows
(VERDICT r07 item 1: the gate must distinguish 0.99 from 2.11).

Grades (worst axis wins):
- ``healthy``      cpu <= 2.0 s, cold >= 1.5 GB/s, warm >= 2.0 GB/s
- ``marginal-*``   cpu <= 2.5 s, cold >= 0.6 GB/s, warm >= 1.2 GB/s
- ``degraded-*``   below marginal on that axis
- ``no-fixture``   no readable fixture path — CPU probe only

Scan-heavy evidence (scale_bench sweeps, closing benches) is only
comparable round-over-round when taken in a healthy window AND the
window holds for the whole run: one start-of-sweep sentinel cannot
see a mid-sweep shift (r07's in-harness profiler re-measure
disagreed with fresh-process probes taken an hour apart, both
"healthy" at start). Consumers therefore BRACKET: :func:`probe_quick`
before and after each measured point / bench, rejecting points whose
brackets disagree by >1.3x (:func:`brackets_agree`).

Usage::  python tools/host_sentinel.py [path_to_read]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

#: pre/post quick probes whose throughput or CPU time differ by more
#: than this are a shifted window — the measurement between them is
#: not attributable to code
BRACKET_TOLERANCE = 1.3

_FIXTURE_CANDIDATES = (
    ".scale_fixtures/sf10/lineitem.parquet",
    ".scale_fixtures/sf5/lineitem.parquet",
    "/root/testdata/sf0.1/lineitem.parquet",
)


def _default_target() -> str | None:
    return next((d for d in _FIXTURE_CANDIDATES if os.path.exists(d)), None)


def _paths_for(target: str) -> list[str]:
    return (
        sorted(glob.glob(os.path.join(target, "*.parquet")))
        if os.path.isdir(target)
        else [target]
    )


def _read_all(paths: list[str], cap_bytes: int | None = None) -> int:
    n = 0
    for p in paths:
        with open(p, "rb", buffering=0) as fh:
            while True:
                b = fh.read(1 << 22)
                if not b:
                    break
                n += len(b)
                if cap_bytes is not None and n >= cap_bytes:
                    return n
    return n


def _cpu_probe(iters: int) -> float:
    import hashlib

    t0 = time.time()
    for i in range(iters):
        hashlib.md5(str(i).encode()).hexdigest()
    return time.time() - t0


def _grade(cpu: float, cold: float | None, warm: float | None) -> str:
    if cold is None:
        return "no-fixture" if cpu <= 2.5 else "degraded-cpu"
    axes = []
    if cpu > 2.5:
        axes.append("degraded-cpu")
    elif cpu > 2.0:
        axes.append("marginal-cpu")
    if cold < 0.6 or (warm is not None and warm < 1.2):
        axes.append("degraded-io")
    elif cold < 1.5 or (warm is not None and warm < 2.0):
        axes.append("marginal-io")
    if not axes:
        return "healthy"
    if any(a.startswith("degraded") for a in axes):
        bad = [a for a in axes if a.startswith("degraded")]
        return "degraded-both" if len(bad) == 2 else bad[0]
    return "marginal-both" if len(axes) == 2 else axes[0]


def probe(target: str | None = None) -> dict:
    """Full sentinel: 2M-md5 CPU probe + cold/warm sequential read of
    the largest available fixture set (best-effort cache drop first).
    Returns the grade dict; never raises on a missing fixture."""
    target = target or _default_target()
    cpu = _cpu_probe(2_000_000)
    if target is None:
        return {
            "cpu_md5_sec": round(cpu, 2),
            "disk_cold_gbps": None,
            "disk_warm_gbps": None,
            "cold_is_true_cold": False,
            "read_gb": 0.0,
            "target": None,
            "grade": _grade(cpu, None, None),
            "note": "no readable fixture path; disk probes skipped",
        }
    paths = _paths_for(target)
    # best-effort cold: drop_caches needs privileges; if unavailable
    # the "cold" number is really warm and will simply match the warm
    # probe (still detects throttled-I/O windows, where even warm
    # reads crawl)
    dropped = False
    try:
        with open("/proc/sys/vm/drop_caches", "w") as fh:
            fh.write("3\n")
        dropped = True
    except OSError:
        pass
    t0 = time.time()
    size = _read_all(paths)
    cold = size / 1e9 / max(time.time() - t0, 1e-9)
    t0 = time.time()
    _read_all(paths)
    warm = size / 1e9 / max(time.time() - t0, 1e-9)
    return {
        "cpu_md5_sec": round(cpu, 2),
        "disk_cold_gbps": round(cold, 3),
        "disk_warm_gbps": round(warm, 3),
        "cold_is_true_cold": dropped,
        "read_gb": round(size / 1e9, 2),
        "target": target,
        "grade": _grade(cpu, cold, warm),
    }


def probe_quick(target: str | None = None, cap_mb: int = 256) -> dict:
    """Cheap (~1 s) bracket probe for per-point / per-bench use:
    500k-md5 CPU slice + one capped sequential read (page-cache-warm
    by design — a warm read far below memory bandwidth still means
    I/O throttling at the virtualization layer). Compare pre/post
    with :func:`brackets_agree`; absolute grades belong to the full
    :func:`probe`."""
    target = target or _default_target()
    _cpu_probe(50_000)  # untimed warm-up: first-call interpreter/
    # allocator effects bias the first probe ~1.4x and would read as
    # a shifted window
    cpu = _cpu_probe(500_000)
    if target is None:
        return {"cpu_sec": round(cpu, 3), "read_gbps": None, "target": None}
    paths = _paths_for(target)
    _read_all(paths, cap_bytes=8 << 20)  # untimed read warm-up
    t0 = time.time()
    size = _read_all(paths, cap_bytes=cap_mb << 20)
    gbps = size / 1e9 / max(time.time() - t0, 1e-9)
    return {
        "cpu_sec": round(cpu, 3),
        "read_gbps": round(gbps, 3),
        "read_gb": round(size / 1e9, 3),
        "target": target,
    }


def brackets_agree(
    pre: dict, post: dict, tolerance: float = BRACKET_TOLERANCE
) -> bool:
    """True when the pre/post quick probes describe the SAME host
    window: CPU and read throughput each within ``tolerance`` x of
    one another (missing disk probes compare on CPU alone)."""
    try:
        c0, c1 = float(pre["cpu_sec"]), float(post["cpu_sec"])
    except (KeyError, TypeError, ValueError):
        return False
    if max(c0, c1) / max(min(c0, c1), 1e-9) > tolerance:
        return False
    r0, r1 = pre.get("read_gbps"), post.get("read_gbps")
    if r0 is None or r1 is None:
        return r0 is None and r1 is None
    return max(r0, r1) / max(min(r0, r1), 1e-9) <= tolerance


def main() -> None:
    target = sys.argv[1] if len(sys.argv) > 1 else None
    print(json.dumps(probe(target)))


if __name__ == "__main__":
    main()
